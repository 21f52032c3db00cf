"""Misc visualization: normal-sphere plots, affinity heatmaps, match drawing.

Re-implements the reference's `visualization/` package
(`visualization/unit_vector_plot.py:8-61`,
`visualization/visualization.py:55-334`) without its heavy deps:

  * the qutip Bloch sphere becomes a dependency-free matplotlib 3D unit
    sphere with the same view/labels and the same output contract
    (uint8 canvas, plot centered on white);
  * the seaborn affinity heatmap becomes plt.imshow + text annotations with
    the same vmin/vmax and '*'-marks-matching annotation scheme;
  * match/bbox drawing (PIL) is kept semantically identical (colors, dot
    styles, line double-stroke, vertical/horizontal concat).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

# the reference's category colormap + purple dot palette
# (visualization.py:17-50)
CMAP = [
    [255, 192, 0], [112, 48, 160], [0, 176, 80], [255, 0, 0],
    [91, 155, 213], [237, 125, 49], [197, 90, 17], [255, 255, 0],
    [112, 173, 71], [37, 94, 145], [155, 194, 230], [169, 209, 142],
    [84, 130, 53], [237, 125, 49], [247, 150, 70], [226, 107, 10],
]
PURPLES = [[204, 192, 218], [176, 163, 190], [148, 134, 163],
           [120, 106, 135], [64, 49, 80]]


def fig2data(fig) -> np.ndarray:
    """Matplotlib figure -> (H, W, 4) RGBA uint8 (reference
    `unit_vector_plot.py:8-24`)."""
    fig.canvas.draw()
    w, h = fig.canvas.get_width_height()
    buf = np.asarray(fig.canvas.buffer_rgba(), dtype=np.uint8)
    return buf.reshape(h, w, 4)


def get_normal_figure(normal, history_normals: Sequence = (),
                      output_size=(480, 640)) -> np.ndarray:
    """Unit-sphere plot of plane normals (reference `get_normal_figure`,
    `unit_vector_plot.py:26-61`; qutip Bloch replaced by a plain
    matplotlib 3D sphere with the same view [-200, 30] and labels)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    # wireframe unit sphere
    u = np.linspace(0, 2 * np.pi, 25)
    v = np.linspace(0, np.pi, 25)
    xs = np.outer(np.cos(u), np.sin(v))
    ys = np.outer(np.sin(u), np.sin(v))
    zs = np.outer(np.ones_like(u), np.cos(v))
    ax.plot_wireframe(xs, ys, zs, color="lightgray", linewidth=0.3)

    normal = np.asarray(normal, np.float64)
    vecs = normal.reshape(-1, 3) if normal.size else np.zeros((0, 3))
    for n in vecs:
        ax.quiver(0, 0, 0, n[0], n[1], n[2], color="g", linewidth=2,
                  arrow_length_ratio=0.15)
    for hn in history_normals:
        hn = np.asarray(hn, np.float64).reshape(-1, 3)
        ax.scatter(hn[:, 0], hn[:, 1], hn[:, 2], color="b", s=12)

    ax.set_zlabel("$z$")
    ax.set_ylabel("$-y$")
    ax.view_init(elev=30, azim=-200)          # Bloch view [-200, 30]
    ax.set_box_aspect((1, 1, 1))
    ax.set_axis_off()

    img = fig2data(fig)
    plt.close(fig)

    import cv2
    ht, wd = img.shape[:2]
    resize_side = min(output_size[0], output_size[1], ht, wd)
    img = cv2.resize(img, (resize_side, resize_side))
    result = np.full((output_size[0], output_size[1], 3), 255, np.uint8)
    xx = (output_size[1] - resize_side) // 2
    yy = (output_size[0] - resize_side) // 2
    result[yy:yy + resize_side, xx:xx + resize_side] = img[:, :, :3]
    return result


def save_affinity_after_stitch(affinity_pred: np.ndarray, sz_i: int,
                               sz_j: int, matching: Sequence[int],
                               mesh_dir: str) -> str:
    """Annotated affinity heatmap ('*' marks the match, value in each cell),
    reference `save_affinity_after_stitch` (visualization.py:55-79)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    max_sz = max(sz_i, sz_j)
    max_sz = 5 if max_sz < 5 else (10 if max_sz < 10 else max_sz)
    affinity_vis = np.asarray(affinity_pred)[:max_sz, :max_sz]

    fig, ax = plt.subplots()
    ax.imshow(affinity_vis, vmin=0.0, vmax=1.0, cmap="rocket"
              if "rocket" in plt.colormaps() else "magma")
    for i in range(min(sz_i, max_sz)):
        for j in range(min(sz_j, max_sz)):
            star = "*\n" if (i < len(matching) and matching[i] == j) else ""
            ax.text(j, i, f"{star}{affinity_pred[i][j]:.2f}",
                    ha="center", va="center", fontsize=7, color="w")
    out = os.path.join(mesh_dir, "affinity_pred.png")
    fig.savefig(out)
    plt.close(fig)
    return out


def get_loc_white(bbox):
    x1, y1, x2, y2 = bbox
    return [x1 + 4, y1 + 4, x2 - 4, y2 - 4]


def get_concat_v(im1, im2, distance: int = 50, vertical: bool = True):
    """Stack two PIL images with a gap (visualization.py:120-128)."""
    from PIL import Image
    if vertical:
        dst = Image.new("RGBA", (im1.width, im1.height + distance + im2.height),
                        (255, 0, 0, 0))
        dst.paste(im2, (0, distance + im1.height))
    else:
        dst = Image.new("RGBA", (im1.width + distance + im2.width, im1.height),
                        (255, 0, 0, 0))
        dst.paste(im2, (distance + im1.width, 0))
    dst.paste(im1, (0, 0))
    return dst


def draw_dot(d, center, color, factor, dotsize: int = 20):
    """Two-ring dot marker (visualization.py:151-157)."""
    oo = int(dotsize * factor)
    io = int(dotsize / 20 * 16 * factor)
    d.ellipse((center[0] - oo, center[1] - oo, center[0] + oo, center[1] + oo),
              fill=tuple(color), outline=tuple(color),
              width=int(dotsize / 20 * 5 * factor))
    d.ellipse((center[0] - io, center[1] - io, center[0] + io, center[1] + io),
              fill=None, outline=(255, 255, 255),
              width=int(dotsize / 20 * 4 * factor))


def draw_bbox(img1, img2, bbox1, bbox2, matching_proposals):
    """Paired-box drawing across two images (visualization.py:96-117)."""
    from PIL import ImageDraw
    d1 = ImageDraw.Draw(img1)
    d2 = ImageDraw.Draw(img2)
    cmap_idx = 0
    for idx1, idx2 in enumerate(matching_proposals):
        if idx2 == -1:
            d1.rectangle(list(bbox1[idx1]), fill=None, outline=(0, 0, 0),
                         width=5)
        else:
            c = tuple(CMAP[cmap_idx % len(CMAP)])
            d1.rectangle(list(bbox1[idx1]), fill=None, outline=c, width=10)
            d1.rectangle(get_loc_white(bbox1[idx1]), fill=None,
                         outline=(255, 255, 255), width=2)
            d2.rectangle(list(bbox2[idx2]), fill=None, outline=c, width=10)
            d2.rectangle(get_loc_white(bbox2[idx2]), fill=None,
                         outline=(255, 255, 255), width=2)
            cmap_idx += 1
    for idx, box in enumerate(bbox2):
        if idx not in matching_proposals:
            d2.rectangle(list(box), fill=None, outline=(0, 0, 0), width=5)
    return img1, img2


def draw_match(img1, img2, centers1, centers2, matching_proposals,
               correct_list, distance: int = 45, factor: int = 4,
               vertical: bool = True, dotsize: int = 20,
               outlier_color=None):
    """Cross-image correspondence drawing (visualization.py:160-250):
    black dots for unmatched, double-stroke colored lines (blue = correct,
    red = outlier) and purple dots for matches.

    img1/img2: paths or HxWx3 arrays; centers1/2: (N, 2) pixel centers;
    matching_proposals: (M, 2) index pairs; correct_list: (M,) 1/0.
    """
    from PIL import Image, ImageDraw

    def load(im):
        return Image.open(im) if isinstance(im, str) else Image.fromarray(im)

    img1, img2 = load(img1), load(img2)
    img1 = img1.resize((img1.width * factor, img1.height * factor))
    img2 = img2.resize((img2.width * factor, img2.height * factor))
    centers1 = [np.floor(np.asarray(c) * factor).astype(np.int32)
                for c in np.asarray(centers1)]
    centers2 = [np.floor(np.asarray(c) * factor).astype(np.int32)
                for c in np.asarray(centers2)]
    distance *= factor
    matching_proposals = np.asarray(matching_proposals).reshape(-1, 2)

    concat = get_concat_v(img1, img2, distance, vertical)
    d = ImageDraw.Draw(concat)
    offset = distance + (img1.height if vertical else img1.width)
    shift = np.array([0, offset]) if vertical else np.array([offset, 0])

    matched1 = set(matching_proposals[:, 0].tolist()) if len(matching_proposals) else set()
    matched2 = set(matching_proposals[:, 1].tolist()) if len(matching_proposals) else set()
    for i, c in enumerate(centers1):
        if i not in matched1:
            draw_dot(d, c, (0, 0, 0), factor, dotsize=dotsize)
    for j, c in enumerate(centers2):
        if j not in matched2:
            draw_dot(d, c + shift, (0, 0, 0), factor, dotsize=dotsize)

    for (i, j), ok in zip(matching_proposals, correct_list):
        color = [26, 133, 255] if ok == 1 else (
            outlier_color if outlier_color is not None else [212, 17, 89])
        c2 = centers2[j] + shift
        line = (int(centers1[i][0]), int(centers1[i][1]),
                int(c2[0]), int(c2[1]))
        d.line(line, fill=tuple(color), width=7 * factor)
        d.line(line, fill=(255, 255, 255), width=2 * factor)

    for i, j in matching_proposals:
        draw_dot(d, centers1[i], PURPLES[-1], factor, dotsize=dotsize)
        draw_dot(d, list(centers2[j] + shift), PURPLES[-1], factor,
                 dotsize=dotsize)
    return concat


def get_labeled_seg(p, score_threshold: float, vis,
                    assigned_colors: Optional[List] = None,
                    paper_img: bool = False) -> np.ndarray:
    """Indexed-score instance overlay (visualization.py:276-306) on our
    ArtiVisualizer: labels are 'idx: score'."""
    keep = np.nonzero(p.scores > score_threshold)[0]
    labels = [f"{idx}: {p.scores[i]:.2f}" for idx, i in enumerate(keep)]
    boxes = p.boxes[keep]
    masks = p.masks[keep] if p.masks is not None else None
    if paper_img:
        boxes, labels = None, None
    vis.overlay_instances(boxes=boxes, labels=labels, masks=masks,
                          assigned_colors=assigned_colors, alpha=0.5)
    return vis.output.get_image()


def get_gt_labeled_seg(dic, vis, assigned_colors: Optional[List] = None,
                       paper_img: bool = False) -> np.ndarray:
    """GT overlay from a dataset dict (visualization.py:309-334)."""
    annos = dic.get("annotations", None)
    if annos:
        from ..data.mapper import BOXMODE_XYWH_ABS
        boxes = []
        for x in annos:
            b = np.asarray(x["bbox"], np.float64)
            if int(x.get("bbox_mode", 0)) == BOXMODE_XYWH_ABS:
                b = np.array([b[0], b[1], b[0] + b[2], b[1] + b[3]])
            boxes.append(b)
        labels = [f"{idx}: gt" for idx in range(len(annos))]
        if paper_img:
            labels, boxes = None, None
        vis.overlay_instances(labels=labels,
                              boxes=np.asarray(boxes) if boxes else None,
                              assigned_colors=assigned_colors)
    return vis.output.get_image()
