"""Fixed-shape keypoint voting (inference candidate selection).

Replaces the per-image/per-class/per-level Python loops of the reference
postprocessors (`postprocess/postprocess.py:95-202`,
`postprocess/postprocess_kd.py:99-203`) with batched XLA:

1. candidate cells: sigmoid score > confidence threshold,
2. reprojected box size taken from the per-level "prefix-max-confidence"
   scan the reference performs (levels visited in order; a level is
   *considered* when its best candidate beats every earlier level's best;
   boxSize = max considered size),
3. per-level quota nk from the same SSC formula (NOTE: normalized over the
   FULL anchor_sizes list, not the truncated per-model list — faithful to
   `postprocess/postprocess.py:143-146` which uses box_coder.anchor_sizes),
4. per-level top-nk cells by score, padded into a fixed (MAX_VOTES,) set.

Used both for teacher-knowledge extraction (KD) and for the eval PnP voting.
All shapes static: (B, A) scores in -> (B, V) votes out.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models import anchors as anchor_lib
from ..models import coder
from .ssc import level_quotas

NEG = -1e9


class Votes(NamedTuple):
    kp2d: jnp.ndarray    # (B, V, 8, 2) decoded keypoints (crop frame)
    score: jnp.ndarray   # (B, V) sigmoid scores (0 for padding)
    valid: jnp.ndarray   # (B, V) bool
    box_size: jnp.ndarray  # (B,) reprojected box size used for quotas


@functools.partial(jax.jit, static_argnames=(
    "input_res", "strides", "all_sizes", "confidence_th",
    "positive_num", "positive_lambda", "max_votes"))
def vote_cells(scores: jnp.ndarray,     # (B, A) sigmoid scores of ONE class
               pred16: jnp.ndarray,     # (B, A, 16) class-selected regression
               *,
               input_res: int,
               strides: Tuple[int, ...],
               all_sizes: Tuple[int, ...],
               confidence_th: float = 0.1,
               positive_num: int = 10,
               positive_lambda: float = 1.0,
               max_votes: int = 64) -> Votes:
    B, A = scores.shape
    L = len(strides)
    sizes = tuple(all_sizes[:L])
    anchors = jnp.asarray(anchor_lib.make_anchors(input_res, strides, sizes))
    slices = anchor_lib.level_slices(input_res, strides)

    kp2d = coder.decode(pred16, anchors)                 # (B, A, 8, 2) crop frame
    span = jnp.maximum(
        kp2d[..., 0].max(-1) - kp2d[..., 0].min(-1),
        kp2d[..., 1].max(-1) - kp2d[..., 1].min(-1))     # (B, A), no +1 here
    cand = scores > confidence_th
    masked = jnp.where(cand, scores, NEG)

    # per-level best candidate and its size
    best_s, best_sz = [], []
    for s, e in slices:
        idx = jnp.argmax(masked[:, s:e], axis=1)
        bs = jnp.take_along_axis(masked[:, s:e], idx[:, None], axis=1)[:, 0]
        bz = jnp.take_along_axis(span[:, s:e], idx[:, None], axis=1)[:, 0]
        best_s.append(bs)
        best_sz.append(jnp.where(bs > NEG / 2, bz, 0.0))
    best_s = jnp.stack(best_s, axis=1)                   # (B, L)
    best_sz = jnp.stack(best_sz, axis=1)

    # reference scan (postprocess.py:123-141): level considered iff its best
    # score strictly beats all earlier levels' best
    prev_max = jnp.concatenate(
        [jnp.zeros((B, 1)), jax.lax.cummax(best_s, axis=1)[:, :-1]], axis=1)
    considered = best_s > prev_max
    box_size = jnp.max(jnp.where(considered, best_sz, 0.0), axis=1)  # (B,)

    # quotas over the FULL size list, then truncated to live levels
    nk_full = level_quotas(jnp.maximum(box_size, 1e-3)[:, None],
                           all_sizes, positive_num, positive_lambda)  # (B, L_all, 1)
    nk = nk_full[:, :L, 0]                                            # (B, L)

    # per-level top-k selection into a fixed vote set
    k_lvl = min(positive_num + 1, max_votes)
    sel_scores, sel_idx, sel_valid = [], [], []
    for li, (s, e) in enumerate(slices):
        k = min(k_lvl, e - s)
        top_v, top_i = jax.lax.top_k(masked[:, s:e], k)               # (B, k)
        rank = jnp.broadcast_to(jnp.arange(k)[None], (B, k))
        ok = (rank < nk[:, li:li + 1]) & (top_v > NEG / 2)
        sel_scores.append(jnp.where(ok, top_v, 0.0))
        sel_idx.append(top_i + s)
        sel_valid.append(ok)
    sel_scores = jnp.concatenate(sel_scores, axis=1)
    sel_idx = jnp.concatenate(sel_idx, axis=1)
    sel_valid = jnp.concatenate(sel_valid, axis=1)

    # compact valid votes first, pad/trim to max_votes
    order = jnp.argsort(~sel_valid, axis=1, stable=True)
    sel_scores = jnp.take_along_axis(sel_scores, order, axis=1)[:, :max_votes]
    sel_idx = jnp.take_along_axis(sel_idx, order, axis=1)[:, :max_votes]
    sel_valid = jnp.take_along_axis(sel_valid, order, axis=1)[:, :max_votes]
    if sel_scores.shape[1] < max_votes:
        pad = max_votes - sel_scores.shape[1]
        sel_scores = jnp.pad(sel_scores, ((0, 0), (0, pad)))
        sel_idx = jnp.pad(sel_idx, ((0, 0), (0, pad)))
        sel_valid = jnp.pad(sel_valid, ((0, 0), (0, pad)))

    kp_sel = jnp.take_along_axis(kp2d, sel_idx[:, :, None, None], axis=1)
    return Votes(kp2d=kp_sel, score=sel_scores, valid=sel_valid, box_size=box_size)


def votes_to_internal_frame(votes: Votes, bbox_trans: jnp.ndarray) -> jnp.ndarray:
    """Map crop-frame votes to the internal 640x480 frame via inv(bbox_trans)
    (reference postprocess_kd.py:171-180). bbox_trans (B, 2, 3)."""
    inv = coder.invert_bbox_trans(bbox_trans)            # (B, 2, 3)
    A = inv[:, None, :2, :2]
    t = inv[:, None, :2, 2]
    xy = jnp.einsum("buij,bukj->buki", A, votes.kp2d,
                    precision=jax.lax.Precision.HIGHEST) + t[:, :, None, :]
    return xy
