"""Checkpointing: save/restore {step, params, batch_stats, opt_state}.

Mirrors the reference's latest.pth/final.pth flow (`train_kd.py:153-160`,
`libs/train_libs.py:144-166`) including "loose loading" (partial restore of
intersecting keys — `libs/train_libs.py:99-105`). Uses flax msgpack
serialization; files are plain bytes, safe for rank-0-writes / all-read.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization
from flax import traverse_util


def save_checkpoint(path: str, state: Any, step: int) -> None:
    payload = {
        "step": np.asarray(step, np.int32),
        "state": jax.device_get(state),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)


def restore_checkpoint(path: str, state_template: Any):
    """Full restore; the template supplies the pytree structure."""
    with open(path, "rb") as f:
        data = f.read()
    payload = serialization.from_bytes(
        {"step": np.asarray(0, np.int32), "state": state_template}, data)
    return payload["state"], int(payload["step"])


def save_params(path: str, params: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    os.replace(tmp, path)


def load_params_loose(path: str, params_template: Any):
    """Partial ("loose") restore: keep template values for missing keys, drop
    checkpoint keys absent from the template, skip shape mismatches
    (reference libs/train_libs.py:99-105)."""
    with open(path, "rb") as f:
        data = f.read()
    restored_raw = serialization.msgpack_restore(data)
    flat_t = traverse_util.flatten_dict(
        serialization.to_state_dict(params_template))
    flat_r = traverse_util.flatten_dict(restored_raw)
    n_loaded = 0
    for k, v in flat_r.items():
        if k in flat_t and np.shape(flat_t[k]) == np.shape(v):
            flat_t[k] = v
            n_loaded += 1
    merged = traverse_util.unflatten_dict(flat_t)
    out = serialization.from_state_dict(params_template, merged)
    return out, n_loaded
