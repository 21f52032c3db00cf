"""Tests: axis codec round-trip, RLE codec, metrics, VOC AP, camera lifting."""

import numpy as np
import pytest

from articulation3d_tpu.data.axis_codec import (angle_offset_to_axis,
                                                axis_to_angle_offset,
                                                axis_to_angle_offset_jnp)
from articulation3d_tpu.utils.camera import get_pcd, project2D
from articulation3d_tpu.utils.metrics import (EA_metric, Line, compare_axis,
                                              compare_planes, ea_matrix,
                                              sa_metric, se_metric)
from articulation3d_tpu.utils.rle import (mask_iou, rle_area, rle_decode,
                                          rle_encode, _counts_decode_str,
                                          _counts_encode_str)
from articulation3d_tpu.utils.vocap import compute_ap, xVOCap


# --------------------------------------------------------------------------- #
# axis codec
# --------------------------------------------------------------------------- #

def _line_points_from_params(sin, cos, p, center, ts=np.linspace(-50, 50, 7)):
    """Sample points on the line x*cos + y*sin = p (center-relative)."""
    # foot of perpendicular + direction (-sin, cos)
    fx, fy = p * cos, p * sin
    pts = np.stack([fx - ts * sin, fy + ts * cos], axis=1)
    return pts + np.asarray(center)


def test_axis_codec_roundtrip_property():
    rs = np.random.RandomState(7)
    for _ in range(200):
        center = rs.uniform(100, 500, 2)
        seg = center.repeat(2).reshape(2, 2).T.ravel() + rs.uniform(-200, 200, 4)
        if np.allclose(seg[:2], seg[2:]):
            continue
        enc = axis_to_angle_offset(seg[None], center[None])[0]
        sin, cos, off, valid = enc
        assert valid == 1
        # (sin, cos) is unit (or zero when the line passes through center)
        n = np.hypot(sin, cos)
        assert n == pytest.approx(1.0, abs=1e-5) or n == pytest.approx(0.0, abs=1e-5)
        if n < 0.5:
            continue  # sign(C)=0 quirk: line through center, direction dropped
        # every original endpoint satisfies x*cos + y*sin = p (center-relative)
        rel = seg.reshape(2, 2) - center
        lhs = rel @ np.array([cos, sin])
        np.testing.assert_allclose(lhs, off * 100, atol=1e-3)
        # decode back and re-encode: line parameters must be preserved
        dec = angle_offset_to_axis(enc[None, :3], center[None])[0]
        if np.allclose(dec, [0, 0, 1, 1]):
            continue  # boundary fallback
        enc2 = axis_to_angle_offset(dec[None].astype(np.float64), center[None])[0]
        # int truncation in decode moves endpoints < 1px -> small tolerance
        np.testing.assert_allclose(enc2[:3] * [1, 1, 100], enc[:3] * [1, 1, 100],
                                   atol=1.5)


def test_axis_codec_through_center_sign_quirk():
    """torch.sign(0) == 0: a line through the center encodes sin = cos = 0."""
    center = np.array([[100.0, 100.0]])
    seg = np.array([[50.0, 50.0, 150.0, 150.0]])  # passes through (100,100)
    enc = axis_to_angle_offset(seg, center)[0]
    assert enc[0] == 0 and enc[1] == 0 and enc[2] == 0


def test_axis_codec_invalid_rows():
    enc = axis_to_angle_offset(np.zeros((2, 4)), np.zeros((2, 2)),
                               valid=np.array([False, False]))
    # placeholder [0,0,1,1] rows, valid bit 0
    np.testing.assert_allclose(enc[:, 3], 0)
    assert np.all(np.isfinite(enc))


def test_axis_codec_jnp_matches_numpy():
    rs = np.random.RandomState(3)
    segs = rs.uniform(0, 640, (50, 4))
    centers = rs.uniform(100, 500, (50, 2))
    a = axis_to_angle_offset(segs, centers)
    b = np.asarray(axis_to_angle_offset_jnp(segs, centers))
    good = np.isfinite(a).all(axis=1)
    np.testing.assert_allclose(a[good], b[good], atol=1e-4)


def test_axis_decode_horizontal_vertical():
    # vertical line x = 30 about center (20, 10): sin=0 -> angle -pi/2
    enc = axis_to_angle_offset(np.array([[30.0, 0.0, 30.0, 50.0]]),
                               np.array([[20.0, 10.0]]))[0]
    seg = angle_offset_to_axis(enc[None, :3], np.array([[20.0, 10.0]]),
                               H=480, W=640)[0]
    assert seg[0] == seg[2] == 30
    assert {seg[1], seg[3]} == {0, 479}


# --------------------------------------------------------------------------- #
# RLE codec
# --------------------------------------------------------------------------- #

def test_rle_roundtrip_random():
    rs = np.random.RandomState(0)
    for shape in [(7, 5), (480, 640), (1, 1), (13, 29)]:
        m = (rs.rand(*shape) > 0.7).astype(np.uint8)
        rle = rle_encode(m)
        np.testing.assert_array_equal(rle_decode(rle), m)
        assert rle_area(rle) == int(m.sum())


def test_rle_known_vector():
    """Pinned pycocotools output: 3x3 mask with one column set."""
    m = np.zeros((3, 3), np.uint8)
    m[:, 1] = 1
    rle = rle_encode(m)
    assert rle["size"] == [3, 3]
    # counts: [3, 3, 3] col-major -> delta-coded string (pycocotools '33N3')
    decoded = _counts_decode_str(rle["counts"])
    assert decoded == [3, 3, 3]
    np.testing.assert_array_equal(rle_decode(rle), m)


def test_rle_counts_delta_coding():
    counts = [0, 5, 2, 100, 1, 3]
    s = _counts_encode_str(counts)
    assert _counts_decode_str(s) == counts


def test_rle_empty_and_full():
    z = np.zeros((4, 6), np.uint8)
    f = np.ones((4, 6), np.uint8)
    assert rle_area(rle_encode(z)) == 0
    assert rle_area(rle_encode(f)) == 24
    np.testing.assert_array_equal(rle_decode(rle_encode(f)), f)


def test_mask_iou():
    a = np.zeros((10, 10), np.uint8); a[:5] = 1
    b = np.zeros((10, 10), np.uint8); b[3:8] = 1
    ious = mask_iou([rle_encode(a)], [rle_encode(b), rle_encode(a)])
    assert ious.shape == (1, 2)
    assert ious[0, 0] == pytest.approx(20 / 80)
    assert ious[0, 1] == pytest.approx(1.0)
    # crowd: denominator is area(dt)
    crowd = mask_iou([rle_encode(a)], [rle_encode(b)], iscrowd=[1])
    assert crowd[0, 0] == pytest.approx(20 / 50)


# --------------------------------------------------------------------------- #
# EA / plane / axis metrics
# --------------------------------------------------------------------------- #

def test_ea_matrix_matches_scalar():
    rs = np.random.RandomState(1)
    preds = rs.uniform(0, 480, (6, 4))
    gts = rs.uniform(0, 480, (4, 4))
    mat = ea_matrix(preds, gts)
    for i in range(6):
        for j in range(4):
            expect = EA_metric(Line(list(preds[i])), Line(list(gts[j])))
            assert mat[i, j] == pytest.approx(expect, abs=1e-9)


def test_sa_se_bounds():
    assert sa_metric(0.0, 0.0) == 1.0
    assert sa_metric(0.0, np.pi / 2) == 0.0
    assert se_metric([0, 0, 0, 0], [0, 0, 0, 0]) == 1.0


def test_compare_planes_angles():
    out = compare_planes([[0, 0, 2.0]], [[0, 0, 1.0], [0, 1.0, 0]])
    assert out["norm"][0, 0] == pytest.approx(0.0, abs=1e-3)
    assert out["norm"][0, 1] == pytest.approx(90.0, abs=1e-3)
    assert out["offset"][0, 0] == pytest.approx(1.0, abs=1e-4)


def test_compare_axis_empty():
    out = compare_axis(np.zeros((0, 3)), np.zeros((3, 3)))
    assert out["norm"].shape == (0, 3)


# --------------------------------------------------------------------------- #
# VOC AP
# --------------------------------------------------------------------------- #

def test_vocap_perfect_detector():
    scores = np.array([0.9, 0.8, 0.7])
    labels = np.array([1, 1, 1])
    assert compute_ap(scores, labels, npos=3) == pytest.approx(1.0)


def test_vocap_known_case():
    # one TP at rank1, one FP at rank2, one TP at rank3; npos=2
    scores = np.array([0.9, 0.8, 0.7])
    labels = np.array([1, 0, 1])
    # recall 0.5 @ prec 1.0, recall 1.0 @ prec 2/3
    assert compute_ap(scores, labels, npos=2) == pytest.approx(
        0.5 * 1.0 + 0.5 * (2 / 3))


def test_vocap_empty():
    assert compute_ap(np.zeros(0), np.zeros(0), npos=5) == 0.0


def test_xvocap_envelope():
    # precision envelope must be monotone non-increasing after interpolation
    rec = np.array([0.2, 0.4, 0.6])
    prec = np.array([0.5, 1.0, 0.25])
    ap = xVOCap(rec, prec)
    assert ap == pytest.approx(0.4 * 1.0 + 0.2 * 0.25)


# --------------------------------------------------------------------------- #
# camera lifting
# --------------------------------------------------------------------------- #

def test_get_pcd_project2d_roundtrip():
    rs = np.random.RandomState(2)
    verts = rs.uniform(50, 400, (20, 2))
    normal = np.array([0.2, -0.3, 0.93])
    normal = normal / np.linalg.norm(normal)
    pcd = np.asarray(get_pcd(verts, normal, 1.7))
    # all points satisfy the plane equation n.x = offset
    np.testing.assert_allclose(pcd @ normal, 1.7, atol=1e-5)
    # and project back to the original pixels
    np.testing.assert_allclose(np.asarray(project2D(pcd)), verts, atol=1e-3)


def test_prefetch_loader_order_and_errors():
    """PrefetchLoader yields the same batches in order and surfaces errors."""
    from articulation3d_tpu.data.mapper import PrefetchLoader

    batches = [{"x": np.full((2, 2), i)} for i in range(7)]
    out = list(PrefetchLoader(batches, depth=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], batches[i]["x"])

    class Boom:
        def __iter__(self):
            yield {"x": np.zeros(2)}
            raise RuntimeError("loader died")

    it = iter(PrefetchLoader(Boom()))
    next(it)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="loader died"):
        next(it)

def test_train_normalization_matches_inference_preprocess():
    """The train step's on-device normalization of the mapper's RAW uint8
    images is numerically identical to the inference path's preprocess op
    (the d2 meta-arch normalizes once for both, `preprocess_image`,
    reference modeling/meta_arch/planercnn.py:62-70).  Guards the round-5
    contract change: the mapper ships uint8, compute_losses normalizes."""
    import jax.numpy as jnp

    from articulation3d_tpu.config import Config
    from articulation3d_tpu.ops.preprocess import preprocess_images

    cfg = Config()
    rs = np.random.RandomState(3)
    frames = rs.randint(0, 256, (2, 64, 96, 3)).astype(np.uint8)
    icfg = cfg.input
    # exactly the expression in train_step.compute_losses
    train_norm = ((jnp.asarray(frames).astype(jnp.float32)
                   - jnp.asarray(icfg.pixel_mean, jnp.float32))
                  / jnp.asarray(icfg.pixel_std, jnp.float32))
    inf_norm = preprocess_images(jnp.asarray(frames), icfg.pixel_mean,
                                 icfg.pixel_std, height=64, width=96)
    np.testing.assert_array_equal(np.asarray(train_norm),
                                  np.asarray(inf_norm))


def test_unpack_bitmasks_inverts_packbits():
    """Device unpack is the exact inverse of the mapper's np.packbits wire
    encoding, including the non-multiple-of-8 width tail."""
    from articulation3d_tpu.train.train_step import unpack_bitmasks

    rs = np.random.RandomState(11)
    for w in (96, 100, 13):
        masks = (rs.rand(3, 5, 17, w) > 0.5).astype(np.uint8)
        packed = np.packbits(masks, axis=-1)
        out = np.asarray(unpack_bitmasks(packed, w))
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, masks.astype(np.float32))


def test_mapper_compact_wire_encodings(tmp_path):
    """The train mapper ships gt_masks_packed (packbits) and u16 depth as
    gt_depth_mm; compute_losses' decode of both matches the eval mapper's
    raw f32 contract bit-for-bit."""
    import cv2

    from articulation3d_tpu.config import Config
    from articulation3d_tpu.data.mapper import PlaneRCNNMapper
    from articulation3d_tpu.train.train_step import unpack_bitmasks

    cfg = Config()
    h, w = 32, 48
    img_path = str(tmp_path / "f.png")
    cv2.imwrite(img_path, np.zeros((h, w, 3), np.uint8))
    depth_mm = np.arange(h * w, dtype=np.uint16).reshape(h, w)
    depth_path = str(tmp_path / "d.png")
    cv2.imwrite(depth_path, depth_mm)
    record = {
        "file_name": img_path, "depth_path": depth_path,
        "image_id": 0, "height": h, "width": w,
        "annotations": [{
            "bbox": [4, 4, 20, 16], "bbox_mode": 0, "category_id": 0,
            "segmentation": (np.arange(h * w).reshape(h, w) % 3 == 0
                             ).astype(np.uint8),
        }],
    }
    train_out = PlaneRCNNMapper(cfg, is_train=True, max_instances=4)(record)
    eval_out = PlaneRCNNMapper(cfg, is_train=False, max_instances=4)(record)
    assert "gt_masks_packed" in train_out and "gt_masks" not in train_out
    assert train_out["gt_masks_packed"].shape == (4, h, (w + 7) // 8)
    np.testing.assert_array_equal(
        np.asarray(unpack_bitmasks(train_out["gt_masks_packed"], w)),
        eval_out["gt_masks"].astype(np.float32))
    assert train_out["gt_depth_mm"].dtype == np.uint16
    np.testing.assert_array_equal(
        train_out["gt_depth_mm"].astype(np.float32) / 1000.0,
        eval_out["gt_depth"])
