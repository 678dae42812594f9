"""BatchNorm-into-conv folding for frozen (inference-mode) networks.

The KD teacher runs every step in eval mode with frozen params
(reference models/model_kd.py:62-75 keeps a second full model in eval mode),
so its BatchNorm is an affine map with constant coefficients:

    y = scale * (conv(x) - mean) / sqrt(var + eps) + bias

Folding scale/sqrt(var+eps) into the conv kernel and the rest into a conv
bias removes the normalize op — and, under bfloat16 compute with float32
stats, the per-layer bf16<->f32 convert traffic around it — from the
per-step teacher forward entirely (the round-2 profile attributed ~2.3 ms
of a 15.5 ms KD step to convert+reduce around BN). The folded params are
applied with `ModelConfig(bn_folded=True)` (see models/blocks.ConvBNAct).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
from flax import serialization


def fold_batchnorm(variables: Dict[str, Any], eps: float = 1e-5) -> Dict[str, Any]:
    """Fold every {conv(no-bias), bn} pair into {conv(kernel*, bias*)}.

    `variables` is a full variable dict {"params": ..., "batch_stats": ...}
    as saved in final.ckpt. Returns a new {"params": ...} dict matching the
    parameter structure of the same model built with `bn_folded=True`.
    Subtrees without a conv/bn sibling pair (FPN, head, GroupNorm) pass
    through unchanged. All arithmetic is float64->float32 on host — folding
    happens once at teacher-load time, never in the compiled step.
    """
    params = serialization.to_state_dict(variables["params"])
    stats = serialization.to_state_dict(variables.get("batch_stats", {}))

    def rec(p: Dict, s: Dict) -> Dict:
        out = {}
        for k, v in p.items():
            sv = s.get(k, {}) if isinstance(s, dict) else {}
            if (isinstance(v, dict) and "conv" in v and "bn" in v
                    and "kernel" in v["conv"] and "bias" not in v["conv"]):
                g = np.asarray(v["bn"]["scale"], np.float64)
                b = np.asarray(v["bn"]["bias"], np.float64)
                m = np.asarray(sv["bn"]["mean"], np.float64)
                var = np.asarray(sv["bn"]["var"], np.float64)
                f = g / np.sqrt(var + eps)
                kernel = np.asarray(v["conv"]["kernel"], np.float64) * f
                out[k] = {"conv": {"kernel": kernel.astype(np.float32),
                                   "bias": (b - m * f).astype(np.float32)}}
            elif isinstance(v, dict):
                out[k] = rec(v, sv)
            else:
                out[k] = v
        return out

    return {"params": rec(params, stats)}
