"""Slow, obviously-correct numpy reference implementations for golden tests.

These mirror the semantics of the native ops the reference stack relies on
(torchvision roi_align / nms, torch grid_sample mask pasting) and are used to
validate the TPU ops to tight tolerances.  Written from the op definitions —
not copied from any codebase.
"""

import math

import numpy as np


def bilinear_interpolate(feat, y, x):
    """torchvision-style bilinear interpolation on (H, W, C)."""
    H, W = feat.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[2:], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= H - 1:
        y_low = y_high = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_low = x_high = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (hy * hx * feat[y_low, x_low] + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low] + ly * lx * feat[y_high, x_high])


def roi_align_np(feat, boxes, spatial_scale, output_size, sampling_ratio, aligned):
    """Naive ROIAlign on (H, W, C) features, (N, 4) boxes."""
    P = output_size
    N = boxes.shape[0]
    C = feat.shape[2]
    out = np.zeros((N, P, P, C), np.float64)
    offset = 0.5 if aligned else 0.0
    for n in range(N):
        x1 = boxes[n, 0] * spatial_scale - offset
        y1 = boxes[n, 1] * spatial_scale - offset
        x2 = boxes[n, 2] * spatial_scale - offset
        y2 = boxes[n, 3] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = max(roi_w, 1.0)
            roi_h = max(roi_h, 1.0)
        bin_w = roi_w / P
        bin_h = roi_h / P
        if sampling_ratio > 0:
            sw = sh = sampling_ratio
        else:
            sh = max(1, int(math.ceil(roi_h / P)))
            sw = max(1, int(math.ceil(roi_w / P)))
        for ph in range(P):
            for pw in range(P):
                acc = np.zeros(C, np.float64)
                for iy in range(sh):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / sh
                    for ix in range(sw):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / sw
                        acc += bilinear_interpolate(feat, yy, xx)
                out[n, ph, pw] = acc / (sh * sw)
    return out


def nms_np(boxes, scores, iou_threshold):
    """Greedy NMS; returns kept indices in descending score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if iou_np(boxes[i], boxes[j]) > iou_threshold:
                suppressed[j] = True
    return np.array(keep, np.int64)


def iou_np(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    ub = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    union = ua + ub - inter
    return inter / union if union > 0 else 0.0


def grid_sample_1d_weights(coord, size):
    """align_corners=False zero-padded bilinear weights for one coordinate."""
    i0 = int(math.floor(coord))
    i1 = i0 + 1
    w1 = coord - i0
    w0 = 1.0 - w1
    pairs = []
    if 0 <= i0 < size:
        pairs.append((i0, w0))
    if 0 <= i1 < size:
        pairs.append((i1, w1))
    return pairs


def paste_mask_np(mask, box, img_h, img_w):
    """grid_sample(align_corners=False)-equivalent paste of one (M, M) mask."""
    M = mask.shape[0]
    out = np.zeros((img_h, img_w), np.float64)
    x0, y0, x1, y1 = box
    for i in range(img_h):
        py = i + 0.5
        my = (py - y0) / (y1 - y0) * M - 0.5
        ypairs = grid_sample_1d_weights(my, M)
        for j in range(img_w):
            px = j + 0.5
            mx = (px - x0) / (x1 - x0) * M - 0.5
            xpairs = grid_sample_1d_weights(mx, M)
            v = 0.0
            for yi, yw in ypairs:
                for xi, xw in xpairs:
                    v += yw * xw * mask[yi, xi]
            out[i, j] = v
    return out
