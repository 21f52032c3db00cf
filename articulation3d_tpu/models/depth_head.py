"""Full-image monocular depth head off the FPN pyramid.

Behavioral spec (reference `modeling/depth_net/depth_head.py:49-103`):
5 conv lanes (conv+BN+LeakyReLU, 256->128) on p6..p2, merged coarse-to-fine
by deconv blocks (nearest 2x upsample + conv + BN + ReLU) with channel
concat, a bilinear resize of the p6 lane to p5's grid, a final 3x3 predictor
and a bilinear resize to the 480x640 output.

The reference's BatchNorms (momentum 0.01) are trained only in stage 3; here
they are implemented as standard flax BatchNorm in inference mode driven by
stored statistics (use_running_average) — training updates batch stats via
the `batch_stats` collection.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DepthHeadConfig


def _upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (align_corners=False) as a fused stencil.

    For scale 2 the triangle kernel degenerates to fixed weights: output
    row 2j = 0.25*x[j-1] + 0.75*x[j], row 2j+1 = 0.75*x[j] + 0.25*x[j+1]
    (edges clamped) — identical numerics to `jax.image.resize(...,
    "linear", antialias=False)` (pinned by tests/test_model.py) but pure
    elementwise adds instead of generic gather resampling, which XLA fuses
    into the surrounding ops.  Matters most for the final C=1 f32
    240x320 -> 480x640 depth resize, where gather lowering wastes the
    (8,128) vector lanes."""
    def up_axis(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        n = a.shape[axis]
        first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        last = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
        prev = jnp.concatenate([first, jax.lax.slice_in_dim(a, 0, n - 1,
                                                            axis=axis)], axis)
        nxt = jnp.concatenate([jax.lax.slice_in_dim(a, 1, n, axis=axis),
                               last], axis)
        even = 0.25 * prev + 0.75 * a
        odd = 0.75 * a + 0.25 * nxt
        inter = jnp.stack([even, odd], axis=axis + 1)
        return inter.reshape(a.shape[:axis] + (2 * n,) + a.shape[axis + 1:])

    return up_axis(up_axis(x, 1), 2)


def _resize_bilinear_nhwc(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False) equivalent.

    antialias=False is load-bearing: the reference's p6->p5 merge is a
    DOWNSAMPLE (16->15 rows at 480x640, `depth_head.py:84`) and torch's
    interpolate never antialiases, while jax.image.resize defaults to a
    widened triangle kernel on downsamples.  Exact 2x upsamples take the
    fused stencil path."""
    if h == 2 * x.shape[1] and w == 2 * x.shape[2]:
        return _upsample2x_bilinear(x)
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="linear",
                            antialias=False)


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvBNAct(nn.Module):
    features: int
    act: str = "leaky_relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.99, dtype=jnp.float32, name="bn")(x)
        if self.act == "leaky_relu":
            return nn.leaky_relu(x, 0.01)
        return nn.relu(x)


class DepthHead(nn.Module):
    cfg: DepthHeadConfig = DepthHeadConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        """features: p2..p6 NHWC -> (B, 480, 640) depth."""
        lanes = {}
        for i, name in enumerate(["p6", "p5", "p4", "p3", "p2"]):
            lanes[name] = ConvBNAct(128, "leaky_relu", dtype=self.dtype,
                                    name=f"conv{i + 1}")(features[name].astype(self.dtype), train)

        def deconv(x, feats_out, name, target_hw=None):
            x = _upsample_nearest_2x(x)
            if target_hw is not None and x.shape[1:3] != target_hw:
                # odd pyramid sizes (never hit at the reference's fixed
                # 480x640) leave the 2x upsample one pixel off the skip grid
                x = _resize_bilinear_nhwc(x, *target_hw)
            x = nn.Conv(feats_out, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99, dtype=jnp.float32, name=f"{name}_bn")(x)
            return nn.relu(x)

        def hw(name):
            return tuple(features[name].shape[1:3])

        x = deconv(lanes["p6"], 128, "deconv1")
        x = _resize_bilinear_nhwc(x, *hw("p5"))
        x = deconv(jnp.concatenate([lanes["p5"], x], axis=-1), 128, "deconv2",
                   target_hw=hw("p4"))
        x = deconv(jnp.concatenate([lanes["p4"], x], axis=-1), 128, "deconv3",
                   target_hw=hw("p3"))
        x = deconv(jnp.concatenate([lanes["p3"], x], axis=-1), 128, "deconv4",
                   target_hw=hw("p2"))
        x = deconv(jnp.concatenate([lanes["p2"], x], axis=-1), 64, "deconv5")
        x = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=jnp.float32,
                    param_dtype=jnp.float32, name="depth_pred")(x.astype(jnp.float32))
        x = _resize_bilinear_nhwc(x, self.cfg.output_height, self.cfg.output_width)
        return x[..., 0]  # (B, 480, 640)


def depth_l1_loss_masked(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Masked L1: valid where gt > 1e-4 (reference depth_head.py:19-21,95)."""
    mask = (gt > 1e-4).astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - gt) * mask) / jnp.maximum(mask.sum(), 1.0)
