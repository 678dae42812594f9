"""SSC positive sampling as fixed-shape, fully-batched XLA code.

The reference implements SSC target assignment with nested Python loops over
images x levels x ground-truths plus `torch.randperm`
(`losses/loss.py:164-268`). TPU re-design:

- Candidate cells = anchor centers whose (floored, clamped) pixel lands inside
  the instance mask of a GT (`losses/loss.py:193-203`).
- Per-level quota  nk[l,g] = round(positive_num * softmax-like weight of
  exp(-lambda * log2(gt_span/level_size)^2))  (`losses/loss.py:210-216`).
- "Random sample nk without replacement" becomes: draw a uniform random score
  per (cell, gt), rank candidates per (level, gt) by score, keep cells with
  rank < nk. This is distributionally identical to randperm-then-take-nk.

Everything is (B, A, G) tensors; no data-dependent shapes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models import anchors as anchor_lib

INF = jnp.float32(1e9)


def level_quotas(spans: jnp.ndarray, level_sizes: Tuple[int, ...],
                 positive_num: int, positive_lambda: float) -> jnp.ndarray:
    """spans (..., G) object box spans -> nk (..., L, G) int32 quotas
    (reference losses/loss.py:210-216; also reused by postprocess voting,
    postprocess/postprocess.py:143-146)."""
    lv = jnp.asarray(level_sizes, jnp.float32)
    dk = jnp.abs(jnp.log2(spans[..., None, :] / lv[:, None]))  # (...,L,G)
    w = jnp.exp(-positive_lambda * dk * dk)
    nk = positive_num * w / w.sum(axis=-2, keepdims=True)
    return (nk + 0.5).astype(jnp.int32)


def gt_box_spans(kp2d: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """kp2d (..., G, 8, 2) projected corners (crop frame); valid (..., G) bool.
    Returns (..., G) max box side with the +1 convention
    (reference libs/boxlist.py:229-233); invalid GTs get span 1."""
    x1 = kp2d[..., 0].min(-1)
    y1 = kp2d[..., 1].min(-1)
    x2 = kp2d[..., 0].max(-1)
    y2 = kp2d[..., 1].max(-1)
    span = jnp.maximum(x2 - x1 + 1.0, y2 - y1 + 1.0)
    return jnp.where(valid, span, 1.0)


def _rank_in_segment(scores: jnp.ndarray) -> jnp.ndarray:
    """scores (N, G) -> rank (N, G): position of each row in ascending order
    per column (rank = argsort of argsort). Kept for tests/reference; the
    assignment hot path uses `_select_k_smallest` (top_k) instead — two full
    sorts per level measured ~half the baseline train step's time on TPU."""
    order = jnp.argsort(scores, axis=0)
    ranks = jnp.zeros_like(order)
    n = scores.shape[0]
    pos = jnp.broadcast_to(jnp.arange(n)[:, None], order.shape)
    return ranks.at[order, jnp.arange(scores.shape[1])[None, :]].set(pos)


def _select_k_smallest(r_lvl: jnp.ndarray, nk_lvl: jnp.ndarray,
                       k_cap: int) -> jnp.ndarray:
    """r_lvl (B, Al, G) random scores, nk_lvl (B, G) quotas (<= k_cap).
    Returns (B, Al, G) bool: cell is among the nk smallest scores of its
    (image, gt) column. Equivalent to rank(r) < nk but via top_k(k_cap) —
    quotas never exceed positive_num, so a full sort is wasted work."""
    B, Al, G = r_lvl.shape
    kk = min(k_cap, Al)
    r_bga = jnp.swapaxes(r_lvl, 1, 2)                       # (B, G, Al)
    _, idx = jax.lax.top_k(-r_bga, kk)                      # (B, G, kk)
    take = jnp.arange(kk)[None, None, :] < nk_lvl[:, :, None]
    sel = jnp.zeros((B, G, Al), bool).at[
        jnp.arange(B)[:, None, None], jnp.arange(G)[None, :, None], idx
    ].set(take)                                             # indices unique per row
    return jnp.swapaxes(sel, 1, 2)


@functools.partial(jax.jit, static_argnames=("input_res", "strides", "sizes",
                                             "positive_num", "positive_lambda"))
def ssc_assign(rng: jax.Array,
               mask: jnp.ndarray,          # (B, H, W) int32 instance ids
               class_ids: jnp.ndarray,     # (B, G) int32, -1 pad
               kp2d: jnp.ndarray,          # (B, G, 8, 2) projected corners, crop frame
               *,
               input_res: int,
               strides: Tuple[int, ...],
               sizes: Tuple[int, ...],
               positive_num: int = 10,
               positive_lambda: float = 1.0):
    """Returns (labels (B,A) int32 in {-1,0,1..C}, matched_gt (B,A) int32)."""
    B, G = class_ids.shape
    anchors = jnp.asarray(anchor_lib.make_anchors(input_res, strides, sizes))
    A = anchors.shape[0]
    H, W = mask.shape[1:]

    # mask value at each anchor center (floor + clamp, reference loss.py:193-198)
    cx = jnp.clip(anchors[:, 0], 0, W - 1).astype(jnp.int32)
    cy = jnp.clip(anchors[:, 1], 0, H - 1).astype(jnp.int32)
    mask_at = mask[:, cy, cx]                                   # (B, A)

    valid_gt = class_ids >= 0                                   # (B, G)
    gt_idx = jnp.arange(1, G + 1, dtype=mask_at.dtype)
    cand = (mask_at[:, :, None] == gt_idx) & valid_gt[:, None, :]   # (B, A, G)

    # quotas
    spans = gt_box_spans(kp2d, valid_gt)                        # (B, G)
    nk = level_quotas(spans, sizes, positive_num, positive_lambda)  # (B, L, G)

    # random scores; non-candidates pushed to +inf so they rank last
    r = jax.random.uniform(rng, (B, A, G))
    r = jnp.where(cand, r, INF)

    slices = anchor_lib.level_slices(input_res, strides)

    selected = jnp.zeros((B, A, G), bool)
    for li, (s, e) in enumerate(slices):
        sel = _select_k_smallest(r[:, s:e, :], nk[:, li, :], positive_num)
        sel = sel & cand[:, s:e, :]
        selected = selected.at[:, s:e, :].set(sel)

    is_pos = selected.any(-1)                                   # (B, A)
    matched_gt = jnp.argmax(selected, axis=-1).astype(jnp.int32)  # first selected gt; 0 default
    in_any_mask = cand.any(-1)

    matched_cls = jnp.take_along_axis(class_ids, matched_gt, axis=1)  # (B, A)
    labels = jnp.where(is_pos, matched_cls + 1,
                       jnp.where(in_any_mask, -1, 0)).astype(jnp.int32)
    return labels, matched_gt
