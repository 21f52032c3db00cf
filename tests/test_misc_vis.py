"""Misc visualization smoke tests (reference `visualization/` package)."""

import numpy as np
import pytest

from articulation3d_tpu.structures import FramePrediction
from articulation3d_tpu.vis.misc import (draw_match, fig2data,
                                         get_concat_v, get_gt_labeled_seg,
                                         get_labeled_seg, get_normal_figure,
                                         save_affinity_after_stitch)
from articulation3d_tpu.vis.visualizer import ArtiVisualizer


def test_normal_figure_shape_and_canvas():
    img = get_normal_figure(np.asarray([0.2159, 0.8909, 0.3995]),
                            history_normals=[np.asarray([[0.0, 1.0, 0.0]])],
                            output_size=(480, 640))
    assert img.shape == (480, 640, 3) and img.dtype == np.uint8
    # white padding on the non-square margin
    assert np.all(img[:, 0] == 255) and np.all(img[:, -1] == 255)
    # the sphere actually drew something
    assert (img < 250).any()


def test_affinity_heatmap_file(tmp_path):
    aff = np.random.RandomState(0).rand(4, 3)
    out = save_affinity_after_stitch(aff, 4, 3, [1, -1, 0, 2], str(tmp_path))
    import os
    assert os.path.exists(out)


def test_draw_match_concat_geometry():
    rs = np.random.RandomState(0)
    im1 = rs.randint(0, 255, (60, 80, 3), np.uint8)
    im2 = rs.randint(0, 255, (60, 80, 3), np.uint8)
    centers1 = np.asarray([[20.0, 30.0], [60.0, 10.0]])
    centers2 = np.asarray([[25.0, 35.0]])
    out = draw_match(im1, im2, centers1, centers2,
                     matching_proposals=np.asarray([[0, 0]]),
                     correct_list=[1], factor=2, distance=10)
    # vertical concat: H = 2*(60*2) + 10*2
    assert out.height == 60 * 2 * 2 + 20
    assert out.width == 80 * 2


def test_labeled_seg_overlays():
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (60, 80, 3), np.uint8)
    masks = np.zeros((2, 60, 80), bool)
    masks[0, 5:20, 5:20] = True
    p = FramePrediction(
        boxes=np.asarray([[5, 5, 20, 20], [30, 30, 50, 50]], np.float32),
        scores=np.asarray([0.9, 0.4]), classes=np.asarray([0, 1]),
        masks=masks, planes=np.zeros((2, 3)),
        rot_axis=np.zeros((2, 3)), tran_axis=np.zeros((2, 2)))
    vis = ArtiVisualizer(img)
    out = get_labeled_seg(p, 0.5, vis)
    assert out.shape == (60, 80, 3)
    assert not np.array_equal(out, img)  # something drawn

    dic = {"annotations": [{"bbox": [5, 5, 15, 15], "bbox_mode": 1,
                            "category_id": 0}]}
    vis2 = ArtiVisualizer(img)
    out2 = get_gt_labeled_seg(dic, vis2)
    assert not np.array_equal(out2, img)


def test_render_img_shades_textured_plane(tmp_path):
    """Debug renderer (reference arti_vis.py:410-465 analog): a textured
    quad in front of the camera must cover pixels, sample its uv map, and
    write render_0.png."""
    import numpy as np
    from articulation3d_tpu.export import TexturedMesh
    from articulation3d_tpu.vis import render_img, render_meshes

    verts = np.array([[-1, -1, 1.0], [1, -1, 1.0], [1, 1, 1.0], [-1, 1, 1.0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    uv_map = np.zeros((8, 8, 3), np.uint8)
    uv_map[:, :, 0] = 255                                # pure red texture
    mesh = TexturedMesh(verts, faces, uvs, uv_map)

    img = render_meshes([mesh], image_size=(120, 160))
    assert img.shape == (120, 160, 3)
    center = img[60, 80]
    assert center[0] > 0.3                               # lit red surface
    assert center[0] > center[1] + 0.2                   # clearly red
    # background stays white
    assert np.allclose(img[0, 0], 1.0)

    out = render_img(str(tmp_path), [mesh], image_size=(120, 160))
    assert out.dtype == np.uint8
    assert (tmp_path / "render_0.png").exists()


def test_render_zbuffer_orders_faces():
    """A near quad must occlude a far quad."""
    import numpy as np
    from articulation3d_tpu.export import TexturedMesh
    from articulation3d_tpu.vis import render_meshes

    def quad(z, red):
        verts = np.array([[-0.5, -0.5, z], [0.5, -0.5, z], [0.5, 0.5, z],
                          [-0.5, 0.5, z]], np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]])
        uv = np.zeros((4, 4, 3), np.uint8)
        uv[:, :, 0 if red else 2] = 255
        uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        return TexturedMesh(verts, faces, uvs, uv)

    img_near_red = render_meshes([quad(1.0, True), quad(2.0, False)],
                                 image_size=(60, 80))
    c = img_near_red[30, 40]
    assert c[0] > c[2]                                   # red (near) wins
    img_rev = render_meshes([quad(2.0, False), quad(1.0, True)],
                            image_size=(60, 80))
    c2 = img_rev[30, 40]
    assert c2[0] > c2[2]                                 # order-independent
