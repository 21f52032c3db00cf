"""Golden tests for the TPU ops layer against naive numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from articulation3d_tpu.ops import (
    roi_align_level, multilevel_roi_align, assign_boxes_to_levels,
    nms_mask, batched_nms_mask, select_top,
    paste_masks, pairwise_iou, encode_deltas, decode_deltas, clip_boxes,
    preprocess_images, resize_bilinear, smooth_l1_loss,
)
from reference_impls import roi_align_np, nms_np, iou_np, paste_mask_np


RNG = np.random.RandomState(0)


def random_boxes(n, h, w, rng=RNG, min_size=4.0):
    x1 = rng.uniform(0, w - min_size, n)
    y1 = rng.uniform(0, h - min_size, n)
    x2 = x1 + rng.uniform(min_size, w / 2, n)
    y2 = y1 + rng.uniform(min_size, h / 2, n)
    return np.stack([x1, y1, np.minimum(x2, w), np.minimum(y2, h)], -1).astype(np.float32)


# ---------------------------------------------------------------------------
# ROIAlign
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("aligned", [False, True])
@pytest.mark.parametrize("sampling_ratio", [2, 0])
def test_roi_align_matches_reference(aligned, sampling_ratio):
    feat = RNG.randn(24, 32, 8).astype(np.float32)
    boxes = random_boxes(12, 24 * 4, 32 * 4)
    got = roi_align_level(jnp.asarray(feat), jnp.asarray(boxes),
                          spatial_scale=0.25, output_size=7,
                          sampling_ratio=sampling_ratio, aligned=aligned,
                          adaptive_cap=8)
    want = roi_align_np(feat, boxes, 0.25, 7, sampling_ratio, aligned)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_roi_align_degenerate_box_zero_output_v2():
    feat = jnp.asarray(RNG.randn(16, 16, 4).astype(np.float32))
    boxes = jnp.asarray([[8.0, 8.0, 8.0, 8.0]])
    out = roi_align_level(feat, boxes, spatial_scale=1.0, output_size=7,
                          sampling_ratio=2, aligned=True)
    assert np.all(np.isfinite(np.asarray(out)))


def test_level_assignment():
    # area 224^2 -> level 4; tiny -> 2; huge -> 5
    boxes = jnp.asarray([
        [0, 0, 224, 224],
        [0, 0, 16, 16],
        [0, 0, 1000, 1000],
        [0, 0, 112, 112],
    ], jnp.float32)
    lv = assign_boxes_to_levels(boxes)
    assert list(np.asarray(lv)) == [4, 2, 5, 3]


def test_multilevel_matches_per_level():
    feats = [jnp.asarray(RNG.randn(64 // s, 80 // s, 6).astype(np.float32))
             for s in (1, 2, 4, 8)]
    strides = [4, 8, 16, 32]
    boxes = np.concatenate([
        random_boxes(4, 60, 70),          # small -> p2
        random_boxes(4, 250, 310) + 0.0,  # bigger
    ]).astype(np.float32)
    out = multilevel_roi_align(feats, jnp.asarray(boxes), strides=strides,
                               output_size=7, sampling_ratio=2, aligned=False)
    levels = np.asarray(assign_boxes_to_levels(jnp.asarray(boxes)))
    for i, b in enumerate(boxes):
        li = levels[i] - 2
        want = roi_align_np(np.asarray(feats[li]), b[None], 1.0 / strides[li],
                            7, 2, False)[0]
        np.testing.assert_allclose(np.asarray(out[i]), want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def test_nms_matches_reference():
    for trial in range(5):
        rng = np.random.RandomState(trial)
        boxes = random_boxes(64, 200, 200, rng)
        scores = rng.rand(64).astype(np.float32)
        keep = nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.ones(64, bool), 0.5)
        got = set(np.nonzero(np.asarray(keep))[0].tolist())
        want = set(nms_np(boxes, scores, 0.5).tolist())
        assert got == want


def test_nms_respects_valid_mask():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    valid = np.array([False, True, True, True])
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(valid), 0.5))
    # invalid top-scorer must not suppress anyone; best valid one survives
    assert keep.tolist() == [False, True, False, False]


def test_batched_nms_separates_classes():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (2, 1))
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1], np.int32)
    keep = np.asarray(batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                       jnp.asarray(classes), jnp.ones(2, bool), 0.5))
    assert keep.tolist() == [True, True]


def test_select_top():
    scores = jnp.asarray([0.1, 0.9, 0.5, 0.7])
    keep = jnp.asarray([True, False, True, True])
    idx, valid = select_top(scores, keep, 3)
    assert np.asarray(idx)[:2].tolist() == [3, 2]
    assert np.asarray(valid).tolist() == [True, True, True]
    idx, valid = select_top(scores, jnp.asarray([False, False, True, False]), 3)
    assert np.asarray(valid).tolist() == [True, False, False]


# ---------------------------------------------------------------------------
# Box transforms
# ---------------------------------------------------------------------------

def test_box_delta_roundtrip():
    src = random_boxes(32, 480, 640)
    tgt = random_boxes(32, 480, 640)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = encode_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
    rec = decode_deltas(deltas, jnp.asarray(src), w)
    np.testing.assert_allclose(np.asarray(rec), tgt, rtol=1e-4, atol=1e-3)


def test_pairwise_iou_matches_reference():
    a = random_boxes(8, 100, 100)
    b = random_boxes(6, 100, 100)
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(8):
        for j in range(6):
            assert abs(got[i, j] - iou_np(a[i], b[j])) < 1e-5


def test_smooth_l1_beta0_is_l1():
    x = jnp.asarray([-2.0, 0.5, 3.0])
    np.testing.assert_allclose(np.asarray(smooth_l1_loss(x, jnp.zeros(3), 0.0)),
                               [2.0, 0.5, 3.0])


# ---------------------------------------------------------------------------
# Mask pasting
# ---------------------------------------------------------------------------

def test_paste_masks_matches_grid_sample():
    m = RNG.rand(2, 14, 14).astype(np.float32)
    boxes = np.array([[10.3, 5.2, 50.8, 40.1], [-5.0, 0.0, 30.0, 64.0]], np.float32)
    soft = paste_masks(jnp.asarray(m), jnp.asarray(boxes), jnp.ones(2, bool),
                       64, 72, threshold=-1.0)
    for i in range(2):
        want = paste_mask_np(m[i], boxes[i], 64, 72)
        np.testing.assert_allclose(np.asarray(soft[i]), want, rtol=1e-4, atol=1e-5)


def test_paste_masks_threshold_and_nms():
    m = np.zeros((2, 8, 8), np.float32)
    m[0] += 0.6
    m[1] += 0.9
    boxes = np.array([[0, 0, 16, 16], [0, 0, 16, 16]], np.float32)
    out = paste_masks(jnp.asarray(m), jnp.asarray(boxes), jnp.ones(2, bool),
                      16, 16, threshold=0.5, nms=True)
    out = np.asarray(out)
    assert not out[0].any()          # suppressed by instance 1 everywhere
    assert out[1, 8, 8]

    out2 = np.asarray(paste_masks(jnp.asarray(m), jnp.asarray(boxes),
                                  jnp.ones(2, bool), 16, 16, threshold=0.5))
    assert out2[0, 8, 8] and out2[1, 8, 8]


def test_paste_masks_invalid_never_wins():
    m = np.ones((2, 8, 8), np.float32)
    boxes = np.array([[0, 0, 16, 16], [0, 0, 16, 16]], np.float32)
    valid = np.array([True, False])
    out = np.asarray(paste_masks(jnp.asarray(m), jnp.asarray(boxes),
                                 jnp.asarray(valid), 16, 16, threshold=0.5, nms=True))
    assert out[0, 8, 8] and not out[1].any()


# ---------------------------------------------------------------------------
# Preprocessing
# ---------------------------------------------------------------------------

def test_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = RNG.randint(0, 255, (48, 64, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 24, 40))
    want = cv2.resize(img, (40, 24), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_preprocess_shapes_and_normalization():
    imgs = RNG.randint(0, 255, (2, 480, 640, 3)).astype(np.uint8)
    out = preprocess_images(jnp.asarray(imgs))
    assert out.shape == (2, 480, 640, 3)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]),
        imgs[0, 0, 0].astype(np.float32) - np.array([103.53, 116.28, 123.675]),
        atol=1e-4)


def test_preprocess_resizes():
    imgs = RNG.randint(0, 255, (1, 360, 720, 3)).astype(np.uint8)
    out = preprocess_images(jnp.asarray(imgs))
    assert out.shape == (1, 480, 640, 3)


def test_sem_seg_postprocess_matches_torch():
    """Crop-then-resize must match the reference's F.interpolate
    (align_corners=False) semantics (modeling/postprocessing.py:77-98)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from articulation3d_tpu.ops import sem_seg_postprocess
    logits = RNG.randn(5, 64, 96).astype(np.float32)  # padded (C, H, W)
    img_size, out_hw = (60, 90), (120, 180)
    got = np.asarray(sem_seg_postprocess(jnp.asarray(logits), img_size, *out_hw))
    want = F.interpolate(
        torch.from_numpy(logits[:, :img_size[0], :img_size[1]])[None],
        size=out_hw, mode="bilinear", align_corners=False)[0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Packed mask readback
# ---------------------------------------------------------------------------

def test_pack_masks_bits_roundtrip():
    """Device-side bit packing must invert exactly via np.unpackbits."""
    from articulation3d_tpu.video.pipeline import pack_masks_bits
    for w in (64, 61):  # 8-divisible and ragged widths
        m = RNG.rand(2, 3, 16, w) > 0.5
        packed = np.asarray(pack_masks_bits(jnp.asarray(m)))
        assert packed.dtype == np.uint8
        assert packed.shape == (2, 3, 16, (w + 7) // 8)
        got = np.unpackbits(packed, axis=-1, count=w).astype(bool)
        np.testing.assert_array_equal(got, m)
