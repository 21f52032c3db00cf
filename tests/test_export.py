"""Export tests: triangulation, mask->polygon, mesh building, obj writing."""

import os

import numpy as np
import pytest

from articulation3d_tpu.export import (TexturedMesh, binary_mask_to_polygon,
                                       create_arrow_mesh,
                                       create_cylinder_mesh,
                                       get_camera_meshes,
                                       get_single_image_mesh_arti, ico_sphere,
                                       save_obj, save_obj_model, triangulate,
                                       write_obj, write_ply)
from articulation3d_tpu.structures import FramePrediction


def _tri_area_sum(verts, tris):
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    return float(np.sum(np.abs(np.cross(b - a, c - a))) / 2)


def test_triangulate_square():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
    tris = triangulate(sq)
    assert tris.shape == (2, 3)
    assert _tri_area_sum(sq, tris) == pytest.approx(4.0)


def test_triangulate_concave():
    # L-shape: area 3
    poly = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]],
                    np.float32)
    tris = triangulate(poly)
    assert tris.shape[0] == 4
    assert _tri_area_sum(poly, tris) == pytest.approx(3.0)


def test_triangulate_matches_python_fallback():
    from articulation3d_tpu.export.mesh import _earcut_py
    rs = np.random.RandomState(0)
    ang = np.sort(rs.uniform(0, 2 * np.pi, 12))
    r = rs.uniform(1, 2, 12)
    poly = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1).astype(np.float32)
    tris_native = triangulate(poly)
    tris_py = _earcut_py(poly.astype(np.float64))
    # identical covered area (topology may differ)
    assert _tri_area_sum(poly, tris_native) == pytest.approx(
        _tri_area_sum(poly, tris_py), rel=1e-5)


def test_binary_mask_to_polygon_roundtrip():
    import cv2
    mask = np.zeros((100, 120), np.uint8)
    mask[20:60, 30:90] = 1
    polys = binary_mask_to_polygon(mask)
    assert len(polys) == 1
    redrawn = np.zeros_like(mask)
    pts = np.asarray(polys[0]).reshape(-1, 2).round().astype(np.int32)
    cv2.fillPoly(redrawn, [pts], 1)
    inter = np.sum(redrawn & mask)
    union = np.sum(redrawn | mask)
    assert inter / union > 0.95


def test_get_single_image_mesh_arti():
    mask = np.zeros((480, 640), np.float32)
    mask[100:300, 200:400] = 1
    planes = np.array([[0.0, 2.0, 0.0]])  # camera normal (0,0,1), offset 2
    img = np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8)
    meshes, uv_maps = get_single_image_mesh_arti(planes, mask[None], img)
    assert len(meshes) == 1 and len(uv_maps) == 1
    m = meshes[0]
    # all verts on the camera plane z = 2
    np.testing.assert_allclose(m.verts[:, 2], 2.0, atol=1e-4)
    assert m.faces.max() < len(m.verts)
    assert m.verts_uvs.min() >= -1e-6 and m.verts_uvs.max() <= 1 + 1e-6
    assert uv_maps[0].shape == (300, 300, 3)


def test_save_obj_and_model(tmp_path):
    mask = np.zeros((480, 640), np.float32)
    mask[100:300, 200:400] = 1
    img = np.zeros((480, 640, 3), np.uint8)
    planes = np.array([[0.0, 2.0, 0.0]])
    meshes, uv_maps = get_single_image_mesh_arti(planes, mask[None], img)
    path = save_obj(str(tmp_path), "test", meshes, uv_maps=uv_maps)
    content = open(path).read()
    assert "mtllib test.mtl" in content
    assert content.count("v ") > 3 and "vt " in content and "f " in content
    assert os.path.exists(tmp_path / "uv_maps" / "test_uv_plane_0.png")

    # full save_obj_model on a synthetic prediction
    from articulation3d_tpu.data.axis_codec import axis_to_angle_offset
    center = np.array([[300.0, 200.0]])
    rot = axis_to_angle_offset(np.array([[200.0, 50, 200, 400]]), center)[0][:3]
    pred = FramePrediction(
        boxes=np.array([[200, 100, 400, 300]], np.float32),
        scores=np.array([0.9]), classes=np.array([0]),
        masks=mask[None], planes=planes.astype(np.float32),
        rot_axis=rot[None], tran_axis=np.array([[0.0, 1.0]], np.float32))
    save_obj_model([pred], [img], 0, str(tmp_path))
    out_obj = tmp_path / "frame_0000" / "arti_pred.obj"
    assert out_obj.exists()
    text = out_obj.read_text()
    # base mesh + 5 sweep copies + 2 axis markers + background
    assert text.count("# mesh") >= 8


def test_primitives():
    v, f = create_cylinder_mesh(0.1, [0, 0, 0], [0, 0, 1])
    assert len(v) > 0 and f.max() < len(v)
    # all ring verts within radius of the axis
    d = np.linalg.norm(v[:, :2], axis=1)
    assert d.max() == pytest.approx(0.1, abs=1e-6)
    v, f = create_arrow_mesh(0.05, [0, 0, 0], [1, 0, 0])
    assert len(v) > 0 and f.max() < len(v)
    cams = get_camera_meshes([{"position": [0, 0, 0], "lookat": [0, 0, 1],
                               "vertical": [0, 1, 0]}])
    assert len(cams) == 1


def test_ico_sphere():
    m = ico_sphere(0, scale=0.1)
    assert m.verts.shape == (12, 3) and m.faces.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(m.verts, axis=1), 0.1,
                               atol=1e-6)
    m1 = ico_sphere(1)
    assert m1.verts.shape[0] == 42  # 12 + 30 edge midpoints


def test_writers(tmp_path):
    verts = np.random.RandomState(0).randn(10, 3)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    colors = np.full((10, 3), 128)
    write_ply(verts, colors, faces, str(tmp_path / "a.ply"))
    write_obj(verts, colors, faces, str(tmp_path / "a.obj"))
    assert (tmp_path / "a.ply").read_text().startswith("ply")
    assert "f 1 2 3" in (tmp_path / "a.obj").read_text()


# --------------------------------------------------------------------------- #
# quaternion world/local transforms (reference mesh_utils.py:34-125)
# --------------------------------------------------------------------------- #

def _rodrigues(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


def test_quat_to_rotmat_matches_rodrigues():
    from articulation3d_tpu.export import quat_to_rotmat
    rs = np.random.RandomState(0)
    for _ in range(5):
        axis = rs.randn(3)
        angle = rs.uniform(-np.pi, np.pi)
        np.testing.assert_allclose(quat_to_rotmat(_quat(axis, angle)),
                                   _rodrigues(axis, angle), atol=1e-6)


def test_transform_meshes_round_trip_and_flip():
    from articulation3d_tpu.export import TexturedMesh, transform_meshes
    from articulation3d_tpu.export.transforms import transform_verts

    rs = np.random.RandomState(1)
    cam = {"position": np.array([0.5, -1.0, 2.0]),
           "rotation": _quat([0.2, 0.9, -0.1], 0.7)}
    mesh = TexturedMesh(rs.randn(7, 3).astype(np.float32),
                        np.array([[0, 1, 2]]))
    out = transform_meshes([mesh], cam)[0]
    assert out.verts.shape == mesh.verts.shape
    # matches the definition: R @ (v * [1,-1,-1]) + t
    R = _rodrigues([0.2, 0.9, -0.1], 0.7)
    expect = (R @ (mesh.verts * [1, -1, -1]).T).T + cam["position"]
    np.testing.assert_allclose(out.verts, expect, atol=1e-5)
    # identity pose = pure suncg2habitat flip
    ident = {"position": np.zeros(3), "rotation": [1.0, 0, 0, 0]}
    np.testing.assert_allclose(
        transform_verts(mesh.verts, ident), mesh.verts * [1, -1, -1],
        atol=1e-6)


def test_plane_params_global_local_round_trip():
    from articulation3d_tpu.export import (get_plane_params_in_global,
                                           get_plane_params_in_local)
    rs = np.random.RandomState(3)
    cam = {"position": np.array([0.3, 0.8, -0.4]),
           "rotation": _quat([1.0, 0.2, 0.5], -1.1)}
    planes = rs.randn(6, 3).astype(np.float32) * 2.0
    world = get_plane_params_in_global(planes, cam)
    back = get_plane_params_in_local(world, cam)
    np.testing.assert_allclose(back, planes, atol=1e-4)


def test_rotate_mesh_for_webview_tilts_floor():
    from articulation3d_tpu.export import (TexturedMesh,
                                           rotate_mesh_for_webview)
    mesh = TexturedMesh(np.eye(3, dtype=np.float32), np.array([[0, 1, 2]]))
    out = rotate_mesh_for_webview([mesh])[0]
    # pure x rotation: x axis unchanged, norms preserved
    np.testing.assert_allclose(out.verts[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out.verts, axis=1), 1.0,
                               atol=1e-6)
    assert abs(out.verts[1][1] - 0.9816272) < 1e-5
