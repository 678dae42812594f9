"""Box utilities: IoU matrix and fixed-shape NMS.

The reference carries full NMS machinery in its BoxList
(`libs/boxlist.py:270-340`: boxlist_nms / boxlist_ml_nms via torchvision,
IoU at `libs/boxlist.py:347-380`) although the published pose path never
calls it. Provided here for API completeness as pure fixed-shape JAX:
`nms` runs a static-length iterative suppression (lax.fori_loop) so it jits
with no dynamic shapes — selected boxes are flagged, not filtered.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix for xyxy boxes with the reference's +1 area convention
    (libs/boxlist.py:347-380). a (N,4), b (M,4) -> (N,M)."""
    area = lambda v: ((v[..., 2] - v[..., 0] + 1.0)
                      * (v[..., 3] - v[..., 1] + 1.0))
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt + 1.0, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area(a)[:, None] + area(b)[None, :] - inter)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_th: float = 0.5,
        valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fixed-shape NMS: returns a (N,) bool keep-mask (no dynamic filtering).

    Equivalent to torchvision.ops.nms as wrapped by the reference's
    boxlist_nms (libs/boxlist.py:270-297) on the kept set; N iterations of
    pick-max / suppress inside lax.fori_loop.
    """
    N = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    alive = jnp.ones((N,), bool) if valid is None else valid.astype(bool)
    keep = jnp.zeros((N,), bool)
    neg = jnp.finfo(scores.dtype).min

    def body(_, state):
        alive, keep = state
        s = jnp.where(alive, scores, neg)
        i = jnp.argmax(s)
        any_alive = alive.any()
        keep = keep.at[i].set(keep[i] | any_alive)
        suppress = (iou[i] > iou_th) & alive
        alive = jnp.where(any_alive, alive & ~suppress, alive)
        return alive, keep

    _, keep = jax.lax.fori_loop(0, N, body, (alive, keep))
    return keep


def ml_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
           iou_th: float = 0.5, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Class-aware NMS (reference boxlist_ml_nms, libs/boxlist.py:300-330):
    boxes of different labels never suppress each other — implemented with
    the standard per-class coordinate-offset trick."""
    span = (jnp.max(boxes) - jnp.min(boxes) + 1.0)
    off = labels.astype(boxes.dtype)[:, None] * span
    return nms(boxes + off, scores, iou_th, valid)
