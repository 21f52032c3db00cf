"""ResNet-50 backbone with frozen BatchNorm, Caffe-style layout.

Behavioral spec from the reference's detectron2 config
(`config/config.yaml:106-126`): depth 50, FrozenBN, STRIDE_IN_1X1 (stride on
the first 1x1 conv of each bottleneck — Caffe/MSRA layout, required to accept
ported d2/Caffe weights), stem 64ch, res2 out 256ch, FREEZE_AT 2.

TPU-first choices:
  * NHWC layout everywhere (XLA's native TPU conv layout).
  * params stay float32; compute optionally bfloat16 (MXU-friendly).
  * FrozenBN is algebraically folded into a scale/shift at apply time —
    4 port-compatible arrays (weight/bias/running_mean/running_var) are kept
    in the param tree so d2 checkpoints port 1:1.
  * `freeze_at` is realized with `lax.stop_gradient` on stage outputs
    (everything up to and including `res{freeze_at}` gets zero gradients),
    mirroring d2's requires_grad=False walk.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ResNetConfig

# blocks per stage for each supported depth
_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics frozen (d2 FrozenBatchNorm2d, eps 1e-5)."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (self.features,), jnp.float32)
        # fold in f32, then cast once — one fused multiply-add on the VPU
        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        return x * mul.astype(self.dtype) + add.astype(self.dtype)


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        return FrozenBatchNorm(self.features, dtype=self.dtype, name="norm")(x)


class _StemConvS2D(nn.Module):
    """The stem's 7x7/stride-2 conv computed space-to-depth.

    A 7x7/s2 conv on (H, W, 3) puts 3 input channels on the MXU's 128-lane
    contraction dim (<3% utilization).  Zero-padding the kernel to 8x8 and
    regrouping 2x2 input pixels into channels turns it into an EXACTLY
    equivalent 4x4/stride-1 VALID conv on (H/2+3, W/2+3, 12) — same FLOPs,
    4x the contraction width, half the spatial extent (the standard TPU
    ResNet space-to-depth transform; cf. the MLPerf TPU ResNet reference).

    The parameter stays the port-compatible (7, 7, 3, 64) HWIO kernel under
    the same `stem/conv/kernel` path — the rearrangement happens at apply
    time on the 9.4 KB kernel, so d2 checkpoints port 1:1 and the flag can
    flip without re-porting (parity test: tests/test_model.py).
    Requires even H and W (every shipped input size; asserted).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features), jnp.float32)
        # 7x7 -> 8x8 (zero row/col at the high index; the extra taps read
        # in-bounds rows of the 3-padded input and carry zero weight)
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin,
                                                    self.features)
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        hp, wp = h + 6, w + 6
        z = xp.reshape(b, hp // 2, 2, wp // 2, 2, cin)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2,
                                                  4 * cin)
        out = jax.lax.conv_general_dilated(
            z.astype(self.dtype), k4.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out  # (B, H/2, W/2, features)


class ConvBNS2D(nn.Module):
    """ConvBN's space-to-depth stem variant: `_StemConvS2D` + FrozenBN,
    module paths identical to ConvBN's (`conv`, `norm`) so the two are
    checkpoint-interchangeable."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _StemConvS2D(self.features, dtype=self.dtype, name="conv")(x)
        return FrozenBatchNorm(self.features, dtype=self.dtype,
                               name="norm")(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck; stride on the 1x1 when stride_in_1x1."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    has_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride

        out = ConvBN(self.bottleneck_channels, 1, s1, self.dtype, name="conv1")(x)
        out = nn.relu(out)
        out = ConvBN(self.bottleneck_channels, 3, s3, self.dtype, name="conv2")(out)
        out = nn.relu(out)
        out = ConvBN(self.out_channels, 1, 1, self.dtype, name="conv3")(out)

        if self.has_shortcut:
            sc = ConvBN(self.out_channels, 1, self.stride, self.dtype, name="shortcut")(x)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """Returns {"res2": ..., "res5": ...} NHWC feature maps."""

    cfg: ResNetConfig = ResNetConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        blocks = _STAGE_BLOCKS[c.depth]
        x = x.astype(self.dtype)

        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool
        if c.space_to_depth_stem:
            # exact 7x7/s2 conv as a 4x4/s1 conv on 2x2-regrouped pixels
            # (MXU-friendly; see _StemConvS2D) — identical param tree
            x = ConvBNS2D(c.stem_out_channels, self.dtype, name="stem")(x)
        else:
            x = ConvBN(c.stem_out_channels, 7, 2, self.dtype, name="stem")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if c.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        outputs = {}
        out_ch = c.res2_out_channels
        bott_ch = c.stem_out_channels  # 64 for R50
        # cfg.remat: recompute each block's interior on the backward pass
        # (nn.remat == jax.checkpoint); block = Bottleneck keeps the
        # activation watermark at the block I/O tensors only
        block_cls = nn.remat(Bottleneck) if c.remat else Bottleneck
        for stage_idx, n_blocks in enumerate(blocks):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = block_cls(
                    out_channels=out_ch,
                    bottleneck_channels=bott_ch,
                    stride=stride if b == 0 else 1,
                    stride_in_1x1=c.stride_in_1x1,
                    has_shortcut=(b == 0),
                    dtype=self.dtype,
                    name=f"{name}_{b}",
                )(x)
            if c.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            if name in c.out_features:
                outputs[name] = x
            out_ch *= 2
            bott_ch *= 2
        return outputs
