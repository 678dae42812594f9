"""Profiling hooks (the reference has none — SURVEY §5.1).

- `trace(dir)`: context manager around `jax.profiler` for a step window;
  view with TensorBoard or xprof.
- `grad_param_ratios(grads, params)`: max/mean |grad|/|param| diagnostics
  (capability match for the reference's `network_grad_ratio`,
  libs/utils.py:20-41), computed in-graph.
"""
from __future__ import annotations

import contextlib
import os
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def grad_param_ratios(grads, params) -> Dict[str, "object"]:
    import jax
    import jax.numpy as jnp

    gleaves = jax.tree_util.tree_leaves(grads)
    pleaves = jax.tree_util.tree_leaves(params)
    gmax = jnp.max(jnp.asarray([jnp.max(jnp.abs(g)) for g in gleaves]))
    pmax = jnp.max(jnp.asarray([jnp.max(jnp.abs(p)) for p in pleaves]))
    gsum = sum(jnp.sum(jnp.abs(g)) for g in gleaves)
    psum = sum(jnp.sum(jnp.abs(p)) for p in pleaves)
    n = sum(g.size for g in gleaves)
    return {
        "grad_max_ratio": gmax / (pmax + 1e-12),
        "grad_mean_ratio": (gsum / n) / (psum / n + 1e-12),
    }
