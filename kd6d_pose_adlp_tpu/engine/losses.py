"""Loss assembly: SSC targets + focal + object-space + OT distillation.

Fixed-shape re-design of `PoseLossDzi.__call__` / `KDPoseLoss.__call__`
(`losses/loss.py:270-311`, `losses/kd_loss.py:111-161`). All terms are
unnormalized sums like the reference; the train step applies the loss weights
(cls 0.1, reg 1, kd kd_weight) and `psum`s gradients across the data mesh.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.batch import Batch, TaskConsts
from ..models import anchors as anchor_lib
from ..models import coder
from ..ops.focal import sigmoid_focal_loss
from ..ops.object_space import object_space_loss, image_space_loss, select_class_pred
from ..ops.sinkhorn import batched_samples_loss
from ..ops import ssc
from ..ops.voting import Votes

_hp = jax.lax.Precision.HIGHEST


class Targets(NamedTuple):
    labels: jnp.ndarray     # (B, A) in {-1, 0, 1..C}
    cls_idx: jnp.ndarray    # (B, A) matched 0-based class
    kp3d_cam: jnp.ndarray   # (B, A, 8, 3) matched GT corners, camera frame
    kp2d_tgt: jnp.ndarray   # (B, A, 8, 2) matched GT corner projections, crop frame
    pos_mask: jnp.ndarray   # (B, A) bool


def prepare_targets(rng: jax.Array, batch: Batch, consts: TaskConsts,
                    cfg: Config) -> Targets:
    """SSC assignment + per-cell matched GT gathering
    (reference losses/loss.py:164-268, fully batched)."""
    m, s = cfg.model, cfg.solver
    valid_gt = batch.class_ids >= 0
    cls_safe = jnp.clip(batch.class_ids, 0)
    corners = consts.kp3d[cls_safe]                               # (B,G,8,3)
    kp2d_gt = coder.project_corners(
        consts.K, batch.rotations, batch.translations, corners,
        batch.bbox_trans[:, None])                                # (B,G,8,2)

    labels, matched = ssc.ssc_assign(
        rng, batch.mask, batch.class_ids, kp2d_gt,
        input_res=m.input_res, strides=m.level_strides, sizes=m.level_sizes,
        positive_num=s.positive_num, positive_lambda=s.positive_lambda)

    kp3d_cam_gt = (jnp.einsum("bgij,bgkj->bgki", batch.rotations, corners,
                              precision=_hp)
                   + batch.translations[:, :, None, :])           # (B,G,8,3)

    kp3d_cam = jnp.take_along_axis(
        kp3d_cam_gt, matched[..., None, None], axis=1)
    kp2d_tgt = jnp.take_along_axis(kp2d_gt, matched[..., None, None], axis=1)
    cls_idx = jnp.take_along_axis(cls_safe, matched, axis=1)
    del valid_gt
    return Targets(labels=labels, cls_idx=cls_idx, kp3d_cam=kp3d_cam,
                   kp2d_tgt=kp2d_tgt, pos_mask=labels > 0)


class LossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_reg: jnp.ndarray
    loss_kd: jnp.ndarray
    num_pos: jnp.ndarray


def pose_losses(rng: jax.Array,
                cls_logits: jnp.ndarray,   # (B, A, n_fg)
                pred_reg: jnp.ndarray,     # (B, A, n_fg*16)
                batch: Batch, consts: TaskConsts, cfg: Config,
                teacher: Optional[tuple] = None,  # (Votes, bbox_trans teacher frame)
                ) -> LossOut:
    m, s, kd = cfg.model, cfg.solver, cfg.kd
    tgt = prepare_targets(rng, batch, consts, cfg)

    loss_cls = sigmoid_focal_loss(cls_logits, tgt.labels,
                                  gamma=s.focal_gamma, alpha=s.focal_alpha)

    anchors = jnp.asarray(anchor_lib.make_anchors(
        m.input_res, m.level_strides, m.level_sizes))
    pred16 = select_class_pred(pred_reg, tgt.cls_idx)             # (B,A,16)
    inv_bt = coder.invert_bbox_trans(batch.bbox_trans)            # (B,2,3)
    pred_xy = coder.decode(pred16, anchors, inv_bt[:, None])      # (B,A,8,2) internal

    if s.loss_reg_type == "3D":
        loss_reg = object_space_loss(pred_xy, tgt.kp3d_cam, tgt.cls_idx,
                                     tgt.pos_mask, consts.inv_K, consts.diameters)
    else:
        tgt16 = coder.encode(tgt.kp2d_tgt, anchors)
        tgt_xy = coder.decode(tgt16, anchors, inv_bt[:, None])
        loss_reg = image_space_loss(pred_xy, tgt_xy, tgt.pos_mask)

    num_pos = tgt.pos_mask.sum()

    loss_kd = jnp.zeros(())
    if teacher is not None:
        votes, w_img, h_img = teacher
        loss_kd = kd_ot_loss(cls_logits, pred_xy, tgt, votes, cfg,
                             w=w_img, h=h_img)
    return LossOut(loss_cls=loss_cls, loss_reg=loss_reg, loss_kd=loss_kd,
                   num_pos=num_pos)


def build_kd_clouds(cls_logits, pred_xy, tgt: Targets, votes: Votes, cfg: Config,
                    w: float = 640.0, h: float = 480.0):
    """Student/teacher point clouds + weights for the OT loss (and for the
    cloud visualizer). Returns (x (B,8,P,2), y (B,8,T,2), a (B,8,P),
    b (B,8,T), img_valid (B,)) in the normalized internal frame."""
    kd = cfg.kd
    B, A = tgt.pos_mask.shape
    P = cfg.solver.max_pos

    # compact the (variable) positive set into P slots per image
    sidx = jax.lax.top_k(tgt.pos_mask.astype(jnp.float32), P)[1]  # (B,P)
    s_valid = jnp.take_along_axis(tgt.pos_mask, sidx, axis=1)
    s_xy = jnp.take_along_axis(pred_xy, sidx[..., None, None], axis=1)  # (B,P,8,2)
    s_xy = s_xy / jnp.asarray([w, h], jnp.float32)

    # per-cell score of its matched class (reference kd_loss.py:83,152)
    scores = jax.nn.sigmoid(cls_logits)
    s_cls = jnp.take_along_axis(scores, tgt.cls_idx[..., None], axis=2)[..., 0]
    s_cls = jnp.clip(s_cls, 1e-3, 1 - 1e-3)
    if kd.wot_detach:
        s_cls = jax.lax.stop_gradient(s_cls)
    s_w = jnp.where(s_valid, jnp.take_along_axis(s_cls, sidx, axis=1), 0.0)

    t_xy = votes.kp2d / jnp.asarray([w, h], jnp.float32)          # (B,T,8,2) internal, normalized by caller's frame
    t_w = jnp.where(votes.valid, votes.score, 0.0)                # (B,T)

    img_valid = s_valid.any(-1) & votes.valid.any(-1)             # (B,)
    # sanitize empty clouds so the solver stays finite; masked out afterwards
    s_w_safe = jnp.where(img_valid[:, None], s_w,
                         jnp.ones_like(s_w) / s_w.shape[1])
    t_w_safe = jnp.where(img_valid[:, None], t_w,
                         jnp.ones_like(t_w) / t_w.shape[1])

    if not kd.weighted_ot:
        s_w_safe = jnp.where(s_valid, 1.0, 0.0)
        s_w_safe = jnp.where(img_valid[:, None], s_w_safe,
                             jnp.ones_like(s_w_safe) / s_w.shape[1])
        t_w_safe = jnp.where(votes.valid, 1.0, 0.0)
        t_w_safe = jnp.where(img_valid[:, None], t_w_safe,
                             jnp.ones_like(t_w_safe) / t_w.shape[1])

    # per keypoint index: clouds (B, 8, N, 2), weights broadcast over k
    x = jnp.swapaxes(s_xy, 1, 2)                                  # (B,8,P,2)
    y = jnp.swapaxes(t_xy, 1, 2)                                  # (B,8,T,2)
    a = jnp.broadcast_to(s_w_safe[:, None, :], x.shape[:3])
    b = jnp.broadcast_to(t_w_safe[:, None, :], y.shape[:3])
    return x, y, a, b, img_valid


def kd_ot_loss(cls_logits, pred_xy, tgt: Targets, votes: Votes, cfg: Config,
               w: float = 640.0, h: float = 480.0) -> jnp.ndarray:
    """Distribution-alignment OT loss (reference losses/kd_loss.py:40-109 +
    losses/loss_libs.py): per image and per keypoint index k, a weighted
    Sinkhorn divergence between the student's positive-cell keypoint cloud and
    the teacher's voted-cell cloud, both in the normalized internal frame.

    Student weights = clamped sigmoid cls score of the cell's own class
    (optionally stop-gradient); teacher weights = sigmoid score of the voted
    cell (the reference stores sqrt(score) and squares it back,
    postprocess_kd.py:57 + kd_loss.py:82). Images with an empty cloud on
    either side are skipped from the mean.
    """
    kd = cfg.kd
    x, y, a, b, img_valid = build_kd_clouds(cls_logits, pred_xy, tgt, votes,
                                            cfg, w=w, h=h)

    from ..ops.sinkhorn_pallas import pallas_tpu_ok, sinkhorn_divergence_pallas
    if kd.gtype == "sinkhorn" and kd.use_pallas and pallas_tpu_ok():
        per_k = sinkhorn_divergence_pallas(
            x, y, a, b, p=kd.p, blur=kd.blur, scaling=kd.scaling,
            reach=kd.reach, diameter=2.0)                          # (B,8)
    else:
        per_k = batched_samples_loss(
            x, y, a, b, gtype=kd.gtype, p=kd.p, blur=kd.blur,
            scaling=kd.scaling, reach=kd.reach, diameter=2.0)      # (B,8)
    per_img = per_k.sum(-1)                                        # (B,)
    n_valid = jnp.maximum(img_valid.sum(), 1)
    return (per_img * img_valid).sum() / n_valid
