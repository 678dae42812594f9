"""Inference postprocess: dense predictions -> 6D poses, fully on device.

Re-design of the reference `PostProcessor` (`postprocess/postprocess.py`):
threshold -> per-level quota voting (ops.voting) -> inverse crop affine ->
RANSAC-EPnP (ops.epnp, on device instead of the reference's CPU
`cv2.solvePnPRansac` hop). Symmetry canonicalization of the predicted R stays
host-side (it is a per-result Euler decomposition, reference
postprocess/postprocess.py:84-90).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.batch import Batch, TaskConsts
from ..ops.epnp import ransac_epnp
from ..ops.object_space import select_class_pred
from ..ops.voting import vote_cells, votes_to_internal_frame


def build_postprocess(cfg: Config, consts: TaskConsts):
    """Returns predict(cls_logits, pred_reg, batch, rng) -> dict of arrays:
    R (B,3,3), T (B,3), score (B,), cls (B,), n_inliers (B,), valid (B,).

    Votes the image's GT class (the reference restricts candidate labels to
    `target.class_ids`, postprocess/postprocess.py:111-113; LINEMOD scenes
    carry one object)."""
    m, t = cfg.model, cfg.test
    solve_class = _make_class_solver(cfg, consts)

    @jax.jit
    def predict(cls_logits, pred_reg, batch: Batch, rng):
        gt_cls = jnp.clip(batch.class_ids[:, 0], 0)
        out = solve_class(gt_cls, cls_logits, pred_reg, batch.bbox_trans, rng)
        out["valid"] = out["valid"] & (batch.class_ids[:, 0] >= 0)
        return out

    return predict


def build_postprocess_multi(cfg: Config, consts: TaskConsts, n_fg: int):
    """Detection-style postprocess: votes + solves PnP for EVERY foreground
    class, returning per-class predictions (B, C, ...) with a validity mask
    (any vote above threshold). Extends the reference's per-class loop
    (postprocess/postprocess.py:95-202) to genuinely multi-object crops — the
    single-prediction path (build_postprocess) keeps exact reference parity
    for LINEMOD-style single-object eval."""
    solve_class = _make_class_solver(cfg, consts)

    @jax.jit
    def predict(cls_logits, pred_reg, batch: Batch, rng):
        B = cls_logits.shape[0]

        def per_class(c_and_rng):
            c, key = c_and_rng
            out = solve_class(jnp.full((B,), c, jnp.int32), cls_logits,
                              pred_reg, batch.bbox_trans, key)
            return {k: out[k] for k in
                    ("R", "T", "score", "cls", "n_inliers", "valid")}

        keys = jax.random.split(rng, n_fg)
        outs = jax.lax.map(per_class, (jnp.arange(n_fg, dtype=jnp.int32), keys))
        # (C, B, ...) -> (B, C, ...)
        return jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), outs)

    return predict


def _make_class_solver(cfg: Config, consts: TaskConsts):
    """Shared vote->RANSAC-EPnP(->LHM) pipeline for one class id per image.

    Takes the (B, 2, 3) crop affines directly (not a full Batch) so the
    scan evaluator (engine/eval_scan.py) can reuse it on stacked arrays."""
    m, t = cfg.model, cfg.test

    def solve(gt_cls, cls_logits, pred_reg, bbox_trans, rng):
        B = cls_logits.shape[0]
        scores = jax.nn.sigmoid(cls_logits)
        s = jnp.take_along_axis(scores, gt_cls[:, None, None], axis=2)[..., 0]
        pred16 = select_class_pred(pred_reg, jnp.broadcast_to(gt_cls[:, None], s.shape))
        votes = vote_cells(
            s, pred16, input_res=m.input_res, strides=m.level_strides,
            all_sizes=m.anchor_sizes, confidence_th=t.confidence_th,
            positive_num=cfg.solver.positive_num,
            positive_lambda=cfg.solver.positive_lambda, max_votes=t.max_votes)
        kp_internal = votes_to_internal_frame(votes, bbox_trans)  # (B,V,8,2)

        corners = consts.kp3d[gt_cls]                                   # (B,8,3)
        V = kp_internal.shape[1]
        pts3d = jnp.broadcast_to(corners[:, None], (B, V, 8, 3)).reshape(B, V * 8, 3)
        pts2d = kp_internal.reshape(B, V * 8, 2)
        valid = jnp.broadcast_to(votes.valid[:, :, None], (B, V, 8)).reshape(B, V * 8)

        rngs = jax.random.split(rng, B)
        solve = functools.partial(ransac_epnp, iters=t.ransac_iters,
                                  reproj_err=t.ransac_reproj_err)
        R, T, n_in = jax.vmap(lambda p3, p2, v, r: solve(p3, p2, v, consts.K, r))(
            pts3d, pts2d, valid, rngs)

        if t.lhm_iters > 0:
            # object-space refinement on the RANSAC inliers; the noise study
            # (scripts/pnp_noise_study.py) shows this halves p90 rotation
            # error at >=2px vote noise vs EPnP-refit alone
            from ..ops.epnp import lhm_refine, reprojection_errors
            from ..ops.smallalg import inv3
            Kf = consts.K.astype(jnp.float32)
            Kinv = inv3(Kf)

            def refine(p3, p2, v, R0, T0):
                pix = jnp.concatenate(
                    [p2, jnp.ones((p2.shape[0], 1), jnp.float32)], -1)
                rays = pix @ Kinv.T
                err = reprojection_errors(p3, p2, Kf, R0, T0)
                w = ((err < t.ransac_reproj_err) & v).astype(jnp.float32)
                w = jnp.where(w.sum() >= 6, w, v.astype(jnp.float32))
                return lhm_refine(p3, rays, w, R0, T0, iters=t.lhm_iters)

            R, T = jax.vmap(refine)(pts3d, pts2d, valid, R, T)

        # result confidence = max vote score, reported as sqrt(sigmoid) like
        # the reference (postprocess/postprocess.py:57)
        conf = jnp.sqrt(jnp.max(jnp.where(votes.valid, votes.score, 0.0), axis=1))
        has_votes = votes.valid.any(-1)
        return dict(R=R, T=T, score=conf, cls=gt_cls, n_inliers=n_in,
                    valid=has_votes, kp2d=kp_internal, vote_valid=votes.valid)

    return solve


def apply_symmetry_host(R, cls_id: int, symmetry: Dict[int, tuple]):
    """Host-side symmetry canonicalization of a predicted rotation."""
    from ..utils.geometry import pose_symmetry_handling
    if cls_id in symmetry:
        return pose_symmetry_handling(R, symmetry[cls_id])
    return R
