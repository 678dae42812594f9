"""Multi-class one-vs-all sigmoid focal loss (reference losses/loss.py:12-40).

Label semantics per cell: 0 = background, 1..C = class id + 1, -1 = ignore
(in-mask but unsampled). Ignore rows contribute exactly zero, so the loss can
be evaluated over ALL cells with no gather — ideal for fixed shapes on TPU.
Sum-reduced like the reference (no normalization; the train driver weights it).
"""
from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       gamma: float = 2.0, alpha: float = 0.25,
                       eps: float = 1e-4) -> jnp.ndarray:
    """logits (..., C); targets (...,) int in {-1, 0, 1..C}. Returns scalar sum."""
    C = logits.shape[-1]
    class_ids = jnp.arange(1, C + 1, dtype=targets.dtype)
    t = targets[..., None]
    p = jnp.clip(jax.nn.sigmoid(logits), eps, 1 - eps)
    term1 = (1 - p) ** gamma * jnp.log(p)
    term2 = p ** gamma * jnp.log(1 - p)
    pos = (t == class_ids).astype(p.dtype)
    neg = ((t != class_ids) & (t >= 0)).astype(p.dtype)
    loss = -pos * alpha * term1 - neg * (1 - alpha) * term2
    return loss.sum()
