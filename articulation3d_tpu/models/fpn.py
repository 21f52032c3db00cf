"""FPN neck over ResNet stages (reference `config/config.yaml:63-71`).

detectron2 `build_resnet_fpn_backbone` semantics: 1x1 lateral convs on
res2..res5, top-down nearest-neighbor 2x upsampling with sum fusion, 3x3
output convs, and a `LastLevelMaxPool` p6 (stride-2 1x1 maxpool on p5).
Returns {"p2".."p6"} NHWC maps, all `out_channels` wide.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ..config import FPNConfig

FPN_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (2H, 2W) nearest, matching F.interpolate(scale_factor=2)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    cfg: FPNConfig = FPNConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        feats = [bottom_up[f] for f in c.in_features]  # res2..res5, fine->coarse

        laterals = []
        for i, f in enumerate(feats):
            lat = nn.Conv(c.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
                          param_dtype=jnp.float32,
                          name=f"lateral_{c.in_features[i]}")(f)
            laterals.append(lat)

        # top-down pathway (coarse -> fine)
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x(merged[i + 1])
            # crop in case of odd sizes (padding keeps shapes exact for 480x640)
            up = up[:, :laterals[i].shape[1], :laterals[i].shape[2], :]
            merged[i] = laterals[i] + up
            if c.fuse_type == "avg":
                merged[i] = merged[i] * 0.5

        outputs = {}
        for i, m in enumerate(merged):
            p_name = f"p{i + 2}"
            outputs[p_name] = nn.Conv(c.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                                      use_bias=True, dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      name=f"output_{p_name}")(m)

        # LastLevelMaxPool: p6 = maxpool(p5, kernel 1, stride 2)
        outputs["p6"] = nn.max_pool(outputs["p5"], (1, 1), strides=(2, 2))
        return outputs
