"""Post-training int8 quantization (PTQ) for frozen/inference networks.

TPU-native deployment feature with no reference counterpart (the reference
serves f32 torch, `test.py` / `libs/eval_libs.py`): the v5e MXU executes
int8 x int8 -> int32 at 2x the bf16 peak, so a frozen forward — the serving
artifact, or the KD teacher that eats ~70% of every live-teacher KD step —
can trade <1 LSB of conv precision for throughput.

Scheme (symmetric, zero-point-free; zero padding stays exact):
- weights: per-output-channel scale = absmax(kernel[..., o]) / 127,
  rounded to int8 once on host;
- activations: per-conv-input static scale = absmax / 127, collected by
  running a few calibration batches through the BN-folded float model
  (models/blocks.QConv mode="calibrate" sows running input absmax into the
  mutable 'quant_stats' collection);
- dequant: int32 conv accumulation * (in_scale * w_scale[o]) + folded bias,
  in f32, then cast back to the compute dtype.

Pipeline: fold_bn.fold_batchnorm -> calibrate_amax -> build_quant_variables.
The result applies with ModelConfig(bn_folded=True, quant_mode="quant").
Head output convs (cls_logits/pose_pred) stay float — negligible FLOPs,
prediction-precision-sensitive (models/head.py).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import numpy as np
from flax import serialization


def quantize_kernel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """HWIO f32 kernel -> (int8 kernel, (O,) f32 per-output-channel scale)."""
    k = np.asarray(kernel, np.float64)
    absmax = np.abs(k).max(axis=(0, 1, 2))
    w_scale = np.maximum(absmax, 1e-12) / 127.0
    kq = np.clip(np.round(k / w_scale), -127, 127).astype(np.int8)
    return kq, w_scale.astype(np.float32)


def calibrate_amax(net_calibrate, variables_folded, calib_batches: Iterable,
                   train: bool = False) -> Dict:
    """Run calibration batches through the quant_mode="calibrate" model and
    return the elementwise-max of the sown per-conv input absmax trees.
    `calib_batches` yields image arrays accepted by the network."""
    stats = None
    for images in calib_batches:
        _, mut = net_calibrate.apply(variables_folded, images, train=train,
                                     mutable=["quant_stats"])
        s = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32),
            serialization.to_state_dict(mut["quant_stats"]))
        stats = s if stats is None else jax.tree_util.tree_map(
            np.maximum, stats, s)
    if stats is None:
        raise ValueError("calibrate_amax needs at least one batch")
    return stats


def build_quant_variables(variables_folded: Dict[str, Any],
                          amax_stats: Dict) -> Dict[str, Any]:
    """Transform BN-folded float variables + calibration stats into the
    variable dict of the quant_mode="quant" model: every conv whose scope
    sowed an 'in_amax' moves from 'params' (f32 kernel+bias) to 'quant'
    (int8 kernel, w_scale, bias, in_scale); everything else (GroupNorm,
    head output convs, per-level scales) stays in 'params'."""
    params = serialization.to_state_dict(variables_folded["params"])

    def rec(p: Dict, s: Dict) -> Tuple[Dict, Dict]:
        p_out, q_out = {}, {}
        for k, v in p.items():
            sv = s.get(k, {}) if isinstance(s, dict) else {}
            if (isinstance(v, dict) and "kernel" in v
                    and isinstance(sv, dict) and "in_amax" in sv):
                kq, w_scale = quantize_kernel(v["kernel"])
                bias = np.asarray(
                    v.get("bias", np.zeros(kq.shape[-1])), np.float32)
                amax = float(np.asarray(sv["in_amax"]))
                q_out[k] = {
                    "kernel_q": kq,
                    "w_scale": w_scale,
                    "bias": bias,
                    "in_scale": np.float32(max(amax, 1e-12) / 127.0),
                }
            elif isinstance(v, dict):
                po, qo = rec(v, sv)
                if po:
                    p_out[k] = po
                if qo:
                    q_out[k] = qo
            else:
                p_out[k] = v
        return p_out, q_out

    p_out, q_out = rec(params, amax_stats)
    return {"params": p_out, "quant": q_out}


def quantize_posenet(model_cfg, n_fg: int, variables_folded: Dict[str, Any],
                     calib_batches: Iterable) -> Tuple[Any, Dict[str, Any]]:
    """One-call PTQ for a PoseNet whose variables are already BN-folded
    (utils/fold_bn.fold_batchnorm): returns (quantized PoseNet instance,
    its variables). `model_cfg` must have bn_folded=True."""
    import dataclasses

    from ..models.pose_net import PoseNet

    assert getattr(model_cfg, "bn_folded", False), \
        "quantize_posenet expects BN-folded variables (fold_batchnorm first)"
    net_c = PoseNet(cfg=dataclasses.replace(model_cfg, quant_mode="calibrate"),
                    n_fg=n_fg)
    stats = calibrate_amax(net_c, variables_folded, calib_batches)
    qvars = build_quant_variables(variables_folded, stats)
    net_q = PoseNet(cfg=dataclasses.replace(model_cfg, quant_mode="quant"),
                    n_fg=n_fg)
    return net_q, qvars
