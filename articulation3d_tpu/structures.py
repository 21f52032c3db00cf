"""Fixed-shape detection structures.

The reference carries detections in detectron2 ``Instances`` objects whose
leading dimension varies per image (`modeling/meta_arch/planercnn.py:61-123`).
Dynamic shapes defeat XLA, so here every per-image collection is padded to a
static bound and carries an explicit ``valid`` mask.  All arrays are
struct-of-arrays and registered as pytrees, so they flow through
``jit``/``vmap``/``pjit`` unchanged.

Box convention matches detectron2: XYXY, float, absolute pixels.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Detections:
    """A fixed-capacity batch of per-image detections.

    Fields always present:
      boxes:   (..., N, 4) XYXY
      scores:  (..., N)
      classes: (..., N) int32
      valid:   (..., N) bool
    Optional (per capability toggles):
      masks:      (..., N, M, M) mask-head probabilities (28x28)
      planes:     (..., N, 3)    plane parameters (normal[*offset])
      rot_axis:   (..., N, 3)    (sin, cos, offset)
      tran_axis:  (..., N, 2)    (sin, cos)
    """

    _FIELDS = ("boxes", "scores", "classes", "valid",
               "masks", "planes", "rot_axis", "tran_axis")

    def __init__(self, boxes, scores, classes, valid,
                 masks=None, planes=None, rot_axis=None, tran_axis=None):
        self.boxes = boxes
        self.scores = scores
        self.classes = classes
        self.valid = valid
        self.masks = masks
        self.planes = planes
        self.rot_axis = rot_axis
        self.tran_axis = tran_axis

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._FIELDS)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- helpers -------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def replace(self, **kw) -> "Detections":
        vals = {f: getattr(self, f) for f in self._FIELDS}
        vals.update(kw)
        return Detections(**vals)

    def asdict(self) -> Dict[str, Any]:
        return {f: getattr(self, f) for f in self._FIELDS if getattr(self, f) is not None}

    @classmethod
    def empty(cls, capacity: int, with_masks: Optional[int] = None,
              planes: bool = False, axes: bool = False) -> "Detections":
        d = cls(
            boxes=jnp.zeros((capacity, 4), jnp.float32),
            scores=jnp.zeros((capacity,), jnp.float32),
            classes=jnp.zeros((capacity,), jnp.int32),
            valid=jnp.zeros((capacity,), bool),
        )
        if with_masks is not None:
            d.masks = jnp.zeros((capacity, with_masks, with_masks), jnp.float32)
        if planes:
            d.planes = jnp.zeros((capacity, 3), jnp.float32)
        if axes:
            d.rot_axis = jnp.zeros((capacity, 3), jnp.float32)
            d.tran_axis = jnp.zeros((capacity, 2), jnp.float32)
        return d

    def to_host(self) -> "HostDetections":
        """Gather to host as trimmed numpy arrays (single image only)."""
        valid = np.asarray(self.valid)
        assert valid.ndim == 1, "to_host operates on a single image"
        keep = np.nonzero(valid)[0]
        out = {}
        for f in self._FIELDS:
            v = getattr(self, f)
            if v is None or f == "valid":
                continue
            out[f] = np.asarray(v)[keep]
        return HostDetections(**out)


class FramePrediction:
    """Per-frame prediction for the temporal pipeline (host numpy).

    The reference's detectron2 ``Instances`` with pred_* fields
    (`utils/opt_utils.py` contract): boxes (N, 4 XYXY), scores (N,),
    classes (N,), masks (N, H, W) bool at IMAGE resolution, planes (N, 3),
    rot_axis (N, 3) [sin, cos, offset], tran_axis (N, 2) [sin, cos].
    """

    def __init__(self, boxes, scores, classes, masks, planes,
                 rot_axis, tran_axis):
        self.boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        self.scores = np.asarray(scores, np.float32).reshape(-1)
        self.classes = np.asarray(classes, np.int64).reshape(-1)
        self.masks = np.asarray(masks)
        self.planes = np.asarray(planes, np.float32).reshape(-1, 3)
        self.rot_axis = np.asarray(rot_axis, np.float32).reshape(-1, 3)
        self.tran_axis = np.asarray(tran_axis, np.float32).reshape(-1, 2)

    def __len__(self):
        return len(self.boxes)

    @property
    def box_centers(self) -> np.ndarray:
        return (self.boxes[:, :2] + self.boxes[:, 2:]) / 2.0

    def copy(self) -> "FramePrediction":
        return FramePrediction(self.boxes.copy(), self.scores.copy(),
                               self.classes.copy(), self.masks,
                               self.planes.copy(), self.rot_axis.copy(),
                               self.tran_axis.copy())


class HostDetections:
    """Trimmed numpy detections for host-side stages (tracker, eval, export)."""

    def __init__(self, boxes, scores, classes, masks=None, planes=None,
                 rot_axis=None, tran_axis=None, full_masks=None):
        self.boxes = boxes
        self.scores = scores
        self.classes = classes
        self.masks = masks
        self.planes = planes
        self.rot_axis = rot_axis
        self.tran_axis = tran_axis
        self.full_masks = full_masks  # (N, H, W) pasted binary masks

    def __len__(self):
        return len(self.boxes)


def pad_to(arr: jnp.ndarray, n: int, axis: int = 0, value=0) -> jnp.ndarray:
    """Pad (or truncate) `arr` to size `n` along `axis` with `value`."""
    cur = arr.shape[axis]
    if cur == n:
        return arr
    if cur > n:
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(0, n)
        return arr[tuple(idx)]
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, n - cur)
    return jnp.pad(arr, pad, constant_values=value)
