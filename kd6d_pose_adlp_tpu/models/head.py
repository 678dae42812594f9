"""Dense pose head (reference models/model.py:370-451).

Two 4-conv towers (3x3, GroupNorm(32), ReLU), shared across pyramid levels:
- cls tower -> cls_logits conv: (n_class-1) channels, focal-prior bias init
- pose tower -> pose_pred conv: (n_class-1)*16 channels, per-level learnable
  scalar Scale on the regression output.

Conv weights ~ N(0, 0.01), biases 0 (reference models/model.py:425-433).
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn


class PoseHead(nn.Module):
    n_fg: int            # n_class - 1
    n_conv: int = 4
    prior: float = 0.01
    n_levels: int = 5    # number of Scale params (reference hardcodes 5)
    quant_mode: str = ""  # int8 PTQ for the TOWER convs (see blocks.QConv);
    # the output convs (cls_logits / pose_pred) stay float: negligible FLOPs,
    # prediction-precision-sensitive
    code_bits: int = 0   # >0 adds a dense binary-code output on the pose
    # tower: (code_bits + 2) channels per class — the hierarchical surface
    # code logits + the corresponded point's 2D offset (engine/zebra)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        width = feats[0].shape[-1]
        conv = lambda c, name, binit=nn.initializers.zeros: nn.Conv(
            c, (3, 3), padding="SAME", use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=nn.initializers.normal(0.01),
            bias_init=binit, name=name)
        if self.quant_mode:
            from .blocks import QConv
            tower_conv = lambda c, name: QConv(
                c, 3, padding="SAME", mode=self.quant_mode, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01), name=name)
        else:
            tower_conv = conv

        cls_tower = [(tower_conv(width, f"cls_conv{i}"),
                      nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                   name=f"cls_gn{i}")) for i in range(self.n_conv)]
        pose_tower = [(tower_conv(width, f"pose_conv{i}"),
                       nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                    name=f"pose_gn{i}")) for i in range(self.n_conv)]
        prior_bias = -math.log((1 - self.prior) / self.prior)
        cls_logits = conv(self.n_fg, "cls_logits",
                          binit=nn.initializers.constant(prior_bias))
        pose_pred = conv(self.n_fg * 16, "pose_pred")
        code_pred = (conv(self.n_fg * (self.code_bits + 2), "code_pred")
                     if self.code_bits > 0 else None)
        scales = self.param("scales", nn.initializers.ones, (self.n_levels,), jnp.float32)

        logits, pose_reg, codes = [], [], []
        for lvl, x in enumerate(feats):
            c = x
            for cv, gn in cls_tower:
                c = nn.relu(gn(cv(c)))
            p = x
            for cv, gn in pose_tower:
                p = nn.relu(gn(cv(p)))
            logits.append(cls_logits(c))
            pose_reg.append(pose_pred(p) * scales[lvl])
            if code_pred is not None:
                codes.append(code_pred(p))
        if code_pred is not None:
            return logits, pose_reg, codes
        return logits, pose_reg
