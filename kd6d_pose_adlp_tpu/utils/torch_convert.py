"""PyTorch -> Flax checkpoint conversion.

Converts reference-format state dicts (pytorchcv DarkNet backbones,
`PoseModule`/`PoseModuleKD` full models — reference `backbone/*.py`,
`models/model.py`) into this framework's parameter/batch_stats trees, so
reference-trained teachers/students and imgclsmob ImageNet weights can be
loaded without retraining (SURVEY §7 hard part 7).

Layout rules:
- Conv2d weight OIHW -> HWIO; Linear weight (out,in) -> (in,out)
- BatchNorm weight/bias -> scale/bias (params); running_mean/var -> batch_stats
- GroupNorm weight/bias -> scale/bias
- flax module names were chosen to mirror the torch names 1:1
  (stage{i}_unit{j}, init_block, inner{i}/out{i}/p6/p7, cls_conv{k}, ...)
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_w(t):
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:  # reference latest.pth layout
        sd = sd["model"]
    return {k: _np(v) for k, v in sd.items()}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_backbone(sd: Dict[str, np.ndarray], prefix: str = ""
                     ) -> Tuple[Dict, Dict]:
    """pytorchcv DarkNet / DarkNet53 state dict -> (params, batch_stats).

    Handles keys like `features.stage2.unit1.conv.weight`,
    `features.init_block.bn.running_mean`, `output.final_conv.{weight,bias}`,
    `output.{weight,bias}` (darknet53 Linear head).
    """
    params: Dict = {}
    stats: Dict = {}
    for key, val in sd.items():
        if prefix and not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        m = re.match(r"features\.(init_block|stage\d+)\.?(unit\d+)?\.(.+)", k)
        if m:
            block = m.group(1) if m.group(2) is None else \
                f"{m.group(1)}_{m.group(2)}"
            rest = m.group(3)
            # DarkUnit: conv1.conv.weight / conv1.bn.*; plain: conv.weight / bn.*
            mm = re.match(r"(conv\d?)\.(conv|bn)\.(.+)", rest)
            if mm:
                sub, layer, leaf = mm.groups()
                base = (block, sub, layer)
            else:
                mm = re.match(r"(conv|bn)\.(.+)", rest)
                if not mm:
                    continue
                layer, leaf = mm.groups()
                base = (block, layer)
            if layer == "conv":
                if leaf == "weight":
                    _set(params, base + ("kernel",), _conv_w(val))
                elif leaf == "bias":
                    _set(params, base + ("bias",), _np(val))
            else:  # bn
                if leaf == "weight":
                    _set(params, base + ("scale",), _np(val))
                elif leaf == "bias":
                    _set(params, base + ("bias",), _np(val))
                elif leaf == "running_mean":
                    _set(stats, base + ("mean",), _np(val))
                elif leaf == "running_var":
                    _set(stats, base + ("var",), _np(val))
            continue
        if k.startswith("output."):
            rest = k[len("output."):]
            if rest == "final_conv.weight":
                _set(params, ("final_conv", "kernel"), _conv_w(val))
            elif rest == "final_conv.bias":
                _set(params, ("final_conv", "bias"), _np(val))
            elif rest == "weight":  # darknet53 Linear
                _set(params, ("output", "kernel"), _np(val).T)
            elif rest == "bias":
                _set(params, ("output", "bias"), _np(val))
    return params, stats


def convert_pose_module(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Full reference PoseModule state dict -> ({'backbone','fpn','head'}
    params, batch_stats). FPN/head key maps follow models/model.py:40-451."""
    params: Dict = {"backbone": {}, "fpn": {}, "head": {}}
    stats: Dict = {"backbone": {}}
    bb_params, bb_stats = convert_backbone(
        {k: v for k, v in sd.items() if k.startswith("backbone.")},
        prefix="backbone.")
    params["backbone"] = bb_params
    stats["backbone"] = bb_stats

    n_scales = 0
    for key, val in sd.items():
        if key.startswith("fpn."):
            k = key[len("fpn."):]
            m = re.match(r"inner_convs\.(\d+)\.(weight|bias)", k)
            if m:
                name, leaf = f"inner{m.group(1)}", m.group(2)
            else:
                m = re.match(r"out_convs\.(\d+)\.(weight|bias)", k)
                if m:
                    name, leaf = f"out{m.group(1)}", m.group(2)
                else:
                    m = re.match(r"top_blocks\.(p6|p7)\.(weight|bias)", k)
                    if not m:
                        continue
                    name, leaf = m.group(1), m.group(2)
            _set(params["fpn"], (name, "kernel" if leaf == "weight" else "bias"),
                 _conv_w(val) if leaf == "weight" else _np(val))
        elif key.startswith("head."):
            k = key[len("head."):]
            m = re.match(r"(cls|pose)_tower\.(\d+)\.(weight|bias)", k)
            if m:
                tower, idx, leaf = m.group(1), int(m.group(2)), m.group(3)
                # Sequential: conv at 3k, GroupNorm at 3k+1, ReLU at 3k+2
                if idx % 3 == 0:
                    name = f"{tower}_conv{idx // 3}"
                    _set(params["head"],
                         (name, "kernel" if leaf == "weight" else "bias"),
                         _conv_w(val) if leaf == "weight" else _np(val))
                elif idx % 3 == 1:
                    name = f"{tower}_gn{idx // 3}"
                    _set(params["head"],
                         (name, "scale" if leaf == "weight" else "bias"), _np(val))
                continue
            m = re.match(r"(cls_logits|pose_pred)\.(weight|bias)", k)
            if m:
                name, leaf = m.groups()
                _set(params["head"],
                     (name, "kernel" if leaf == "weight" else "bias"),
                     _conv_w(val) if leaf == "weight" else _np(val))
                continue
            m = re.match(r"scales\.(\d+)\.scale", k)
            if m:
                n_scales = max(n_scales, int(m.group(1)) + 1)
    if n_scales:
        scales = np.ones((max(n_scales, 5),), np.float32)
        for key, val in sd.items():
            m = re.match(r"head\.scales\.(\d+)\.scale", key)
            if m:
                scales[int(m.group(1))] = float(np.asarray(val).reshape(()))
        params["head"]["scales"] = scales
    return params, stats


def load_imgclsmob_zip(zip_path: str) -> Dict[str, np.ndarray]:
    """Load a pytorchcv/imgclsmob release zip (one `{name}-{error}-{sha1}.pth`
    state-dict file inside — reference backbone/model_store.py:560-587) and
    return the numpy state dict."""
    import tempfile
    import zipfile

    import torch
    with zipfile.ZipFile(zip_path) as zf:
        names = [n for n in zf.namelist() if n.endswith(".pth")]
        if len(names) != 1:
            raise ValueError(f"{zip_path}: expected exactly one .pth inside, "
                             f"got {names}")
        with tempfile.TemporaryDirectory() as td:
            zf.extract(names[0], td)
            sd = torch.load(f"{td}/{names[0]}", map_location="cpu",
                            weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def imgclsmob_to_backbone_ckpt(zip_path: str, backbone: str, out_path: str,
                               input_res: int = 256) -> int:
    """One-call ingestion of an imgclsmob ImageNet release zip into a
    final.ckpt-layout file usable as `train_kd.py --backbone_init`: ingest
    the zip, convert the backbone tensors, overlay them on a fresh PoseNet
    init, save {"params","batch_stats"}. Returns the tensor count loaded.
    Rehearsed (with a fabricated zip) by tests/test_torch_convert.py."""
    import jax
    import jax.numpy as jnp

    from ..config import ModelConfig
    from ..models.pose_net import PoseNet
    from .checkpoint import save_params

    sd = load_imgclsmob_zip(zip_path)
    params, stats = convert_backbone(sd)
    net = PoseNet(cfg=ModelConfig(backbone=backbone, input_res=input_res))
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, input_res, input_res, 3)))
    merged = merge_into_variables(
        variables, {"backbone": params}, {"backbone": stats})
    save_params(out_path, {"params": merged["params"],
                           "batch_stats": merged.get("batch_stats", {})})
    from flax import traverse_util
    return (len(traverse_util.flatten_dict(params))
            + len(traverse_util.flatten_dict(stats)))


def merge_into_variables(variables: Dict, params: Dict, stats: Dict,
                         strict: bool = False) -> Dict:
    """Overlay converted tensors onto an initialized variables dict. Keys the
    model doesn't have (e.g. the ImageNet classifier head when converting a
    backbone into the detector) are skipped unless strict; shape mismatches
    always raise so silent corruption is impossible."""
    from flax import traverse_util

    out_p = traverse_util.flatten_dict(variables["params"])
    new_p = traverse_util.flatten_dict(params)
    skipped = []
    for k, v in new_p.items():
        if k not in out_p:
            if strict:
                raise KeyError(f"converted param {k} not in model")
            skipped.append(k)
            continue
        if tuple(out_p[k].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {k}: {out_p[k].shape} vs {v.shape}")
        out_p[k] = v.astype(np.asarray(out_p[k]).dtype)
    result = {"params": traverse_util.unflatten_dict(out_p)}
    if "batch_stats" in variables:
        out_s = traverse_util.flatten_dict(variables["batch_stats"])
        new_s = traverse_util.flatten_dict(stats)
        for k, v in new_s.items():
            if k in out_s and tuple(out_s[k].shape) == tuple(v.shape):
                out_s[k] = v.astype(np.asarray(out_s[k]).dtype)
        result["batch_stats"] = traverse_util.unflatten_dict(out_s)
    return result
