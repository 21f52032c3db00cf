"""Dataset mapper: JSON records -> fixed-shape padded numpy training batches.

Re-implements the reference `PlaneRCNNMapper`
(`articulation3d/articulation3d/data/planercnn_transforms.py:253-376`) for
the TPU pipeline: instead of per-image detectron2 ``Instances`` with dynamic
instance counts, every record maps to padded arrays of capacity
``max_instances`` with a validity mask, so batches stack into fixed-shape
device arrays.

Reference semantics preserved:
  * image read in BGR, resized to the record's (width, height)
    (`planercnn_transforms.py:317`), float32 HWC; missing-file fallbacks
    `.jpg -> .png`, `frames_hq -> frames_hq_neg`, zeros on failure
    (`planercnn_transforms.py:309-322`);
  * depth loaded with cv2 IMREAD_UNCHANGED and divided by 1000
    (`depthShift`, `planercnn_transforms.py:293,342-347`);
  * boxes converted to XYXY and clipped; empty boxes dropped
    (`annotations_to_instances`, `planercnn_transforms.py:180-251`);
  * axis segments encoded about box centers via the codec
    (`planercnn_transforms.py:243-249`).

Polygon rasterization uses cv2.fillPoly (pycocotools' frPyObjects is not in
this environment; both rasterize the same integer-vertex polygons).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from ..config import Config
from .axis_codec import axis_to_angle_offset

BOXMODE_XYXY_ABS = 0
BOXMODE_XYWH_ABS = 1


def convert_box(box: Sequence[float], mode: int) -> np.ndarray:
    box = np.asarray(box, np.float64)
    if mode == BOXMODE_XYXY_ABS:
        return box
    if mode == BOXMODE_XYWH_ABS:
        return np.array([box[0], box[1], box[0] + box[2], box[1] + box[3]])
    raise ValueError(f"unsupported bbox_mode {mode}")


def polygons_to_bitmask(polygons: List[Sequence[float]], height: int,
                        width: int) -> np.ndarray:
    """Rasterize COCO-style polygon lists to a binary (H, W) uint8 mask."""
    mask = np.zeros((height, width), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in polygons if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def read_image_bgr(path: str, height: int, width: int) -> np.ndarray:
    """Read + resize one frame with the reference's fallback chain.

    Returns RAW uint8 BGR: mean/std normalization is done on device by the
    consumer (`train_step.compute_losses` / `ops.preprocess`), so the
    host->device payload stays 1 byte/px instead of 4."""
    if not os.path.exists(path):
        path = path.replace(".jpg", ".png")
    if not os.path.exists(path):
        path = path.replace("frames_hq", "frames_hq_neg")
    img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR, matching INPUT.FORMAT
    if img is None:
        return np.zeros((height, width, 3), np.uint8)
    return cv2.resize(img, (width, height))


class PlaneRCNNMapper:
    """record dict -> dict of fixed-shape numpy arrays (one image)."""

    def __init__(self, cfg: Config, is_train: bool = True,
                 max_instances: int = 20, image_root: Optional[str] = None):
        self.cfg = cfg
        self.is_train = is_train
        self.max_instances = max_instances
        self.image_root = image_root
        self.depth_shift = 1000.0

    def __call__(self, record: Dict) -> Dict[str, np.ndarray]:
        h = int(record["height"])
        w = int(record["width"])
        file_name = record["file_name"]
        if self.image_root is not None and not os.path.isabs(file_name):
            file_name = os.path.join(self.image_root, file_name)
        image = read_image_bgr(file_name, h, w)

        out: Dict[str, np.ndarray] = {
            "images": image,
            "image_id": record.get("image_id", record.get("file_name", "")),
            "file_name": record["file_name"],
            "height": h,
            "width": w,
        }

        mcfg = self.cfg.model
        if (mcfg.depth_on and "depth_head" not in mcfg.freeze
                and "depth_path" in record):
            depth = cv2.imread(record["depth_path"], cv2.IMREAD_UNCHANGED)
            if depth is None:
                depth = np.zeros((h, w), np.float32)
            if self.is_train and depth.dtype == np.uint16:
                # ship the raw u16 millimeter map; the device divides by
                # depth_shift (train_step.compute_losses) — 2 bytes/px
                # instead of 4 through the host->device path
                out["gt_depth_mm"] = depth
            else:
                out["gt_depth"] = depth.astype(np.float32) / self.depth_shift

        annos = [a for a in record.get("annotations", [])
                 if a.get("iscrowd", 0) == 0]
        out.update(self._instances(annos, h, w))
        return out

    def _instances(self, annos: List[Dict], h: int, w: int) -> Dict[str, np.ndarray]:
        g = self.max_instances
        mcfg = self.cfg.model
        # gate the heavy per-toggle targets: a stage-1 (detector-only)
        # recipe must not rasterize + ship (g, 480, 640) float mask stacks
        # the step never reads — at ims 16 that is ~786MB/step of zeros
        # through the host->device path (d2's Instances only carry the
        # fields the mapper put there; fixed-shape padding must not undo
        # that frugality)
        with_masks = mcfg.mask_on or mcfg.refine_on
        boxes = np.zeros((g, 4), np.float32)
        classes = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        # uint8 bitmasks: 4x less host->device traffic than f32 (the loss
        # crop casts to f32 on device, train/targets.py::crop_gt_masks)
        masks = (np.zeros((g, h, w), np.uint8) if with_masks else None)
        planes = np.zeros((g, 3), np.float32)
        rot_axis = np.tile(np.asarray([0, 0, 1, 0], np.float32), (g, 1))
        tran_axis = np.tile(np.asarray([0, 0, 1, 0], np.float32), (g, 1))

        kept = 0
        for a in annos:
            if kept >= g:
                break
            box = convert_box(a["bbox"], int(a.get("bbox_mode", BOXMODE_XYWH_ABS)))
            box = np.clip(box, [0, 0, 0, 0], [w, h, w, h])
            if box[2] <= box[0] or box[3] <= box[1]:  # d2 nonempty() drop
                continue
            i = kept
            boxes[i] = box
            classes[i] = int(a["category_id"])
            valid[i] = True
            if with_masks and "segmentation" in a:
                seg = a["segmentation"]
                if isinstance(seg, list):
                    masks[i] = polygons_to_bitmask(seg, h, w)
                elif isinstance(seg, dict):
                    from ..utils.rle import rle_decode
                    masks[i] = rle_decode(seg)
                elif isinstance(seg, np.ndarray):
                    masks[i] = seg
            if "plane" in a and a["plane"] is not None:
                planes[i] = np.asarray(a["plane"], np.float32)
            center = (box[:2] + box[2:]) / 2.0
            if a.get("rot_axis") is not None:
                rot_axis[i] = axis_to_angle_offset(
                    np.asarray(a["rot_axis"], np.float32)[None], center[None])[0]
            if a.get("tran_axis") is not None:
                tran_axis[i] = axis_to_angle_offset(
                    np.asarray(a["tran_axis"], np.float32)[None], center[None])[0]
            kept += 1

        out = {"gt_boxes": boxes, "gt_classes": classes, "gt_valid": valid}
        if with_masks:
            if self.is_train:
                # bitpack along W: (g, h, ceil(w/8)) uint8, 8x less
                # host->device traffic; unpacked on device by
                # train_step.unpack_bitmasks (exact inverse)
                out["gt_masks_packed"] = np.packbits(masks, axis=-1)
            else:
                out["gt_masks"] = masks
        if mcfg.plane_on:
            out["gt_planes"] = planes
        if mcfg.axis_on:
            out["gt_rot_axis"] = rot_axis
            out["gt_tran_axis"] = tran_axis
        return out


def collate(samples: List[Dict[str, np.ndarray]],
            keys: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
    """Stack per-image arrays into a batch; non-array fields become lists."""
    if not samples:
        return {}
    if keys is None:
        keys = samples[0].keys()
    batch = {}
    for k in keys:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[k] = np.stack(vals, axis=0)
        else:
            batch[k] = vals
    return batch


class DetectionLoader:
    """Minimal epoch-shuffled batch loader over a registered dataset.

    The reference uses d2's multiworker dataloader (`tools/train_net.py:41-45`);
    here batching is host-side numpy feeding one device array per step.  An
    infinite iterator with per-epoch reshuffling (seeded) for training; a
    single ordered pass for eval.
    """

    def __init__(self, records: List[Dict], mapper: PlaneRCNNMapper,
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_gt_keys: bool = False):
        self.records = records
        self.mapper = mapper
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_gt_keys = drop_gt_keys

    def __len__(self):
        return (len(self.records) + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch_idx: int = 0):
        order = np.arange(len(self.records))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.shuffle and len(idx) < self.batch_size:
                continue  # drop last partial batch during training
            samples = [self.mapper(self.records[i]) for i in idx]
            yield collate(samples)

    def __iter__(self):
        e = 0
        while True:
            yield from self.epoch(e)
            if not self.shuffle:
                return
            e += 1


class PrefetchLoader:
    """Background-thread prefetch around any batch iterable.

    The reference overlaps input work with compute via 4 dataloader worker
    processes (`config/config.yaml:5` DATALOADER.NUM_WORKERS).  Here a
    single daemon thread runs the mapper (cv2 imread + rasterize) while the
    device executes the previous step, with a bounded queue for backpressure.

    Threads suffice (vs processes): the heavy ops release the GIL inside
    cv2/numpy, and the consumer is device-bound.
    """

    def __init__(self, loader, depth: int = 3):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            try:
                for batch in self.loader:
                    q.put(batch)
            except BaseException as e:  # surfaced on the consumer side
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
