"""Dense binary-code pose pipeline (ZebraPose-style, BASELINE.json configs[5]).

The reference framework regresses 8 bbox-corner keypoints per cell
(models/model.py:106-166) and PnPs over voted corners. This variant makes
every confident cell ONE dense 2D-3D correspondence instead: the cell
regresses the hierarchical binary code (ops/binary_code) of the mesh
surface point it corresponds to, plus that point's 2D offset from the
anchor center. Decoding a cell's code picks a vertex; PnP then runs over
hundreds of correspondences rather than 8 corners. Dense distillation
falls out naturally — a teacher's per-cell code probabilities are soft
BCE targets for the student on the same cells.

Everything is fixed-shape and batched: targets compact the SSC positive
set into `solver.max_pos` slots (same trick as engine/losses.build_kd_clouds),
so the per-cell nearest-vertex search is a (B, P, V) matmul, not a
(B, A, V) one. No reference counterpart exists for this file — it is a
beyond-reference feasibility configuration (design note: DESIGN.md).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..data.batch import Batch, TaskConsts
from ..models import anchors as anchor_lib
from ..models import coder
from ..models.pose_net import PoseNet
from ..ops import ssc
from ..ops.binary_code import code_bce
from ..ops.epnp import ransac_epnp
from ..ops.focal import sigmoid_focal_loss
from .steps import TrainState

_hp = jax.lax.Precision.HIGHEST


class ZebraTargets(NamedTuple):
    labels: jnp.ndarray    # (B, A) SSC labels in {-1, 0, 1..C}
    sidx: jnp.ndarray      # (B, P) compacted positive cell indices
    s_valid: jnp.ndarray   # (B, P) bool: slot holds a real positive
    cls_idx: jnp.ndarray   # (B, P) matched 0-based class
    code_tgt: jnp.ndarray  # (B, P, n_bits) target codes in {0, 1}
    off_tgt: jnp.ndarray   # (B, P, 2) target offset (anchor-normalized)
    pt3d: jnp.ndarray      # (B, P, 3) corresponded vertex, object frame (mm)


def zebra_targets(rng: jax.Array, batch: Batch, consts: TaskConsts,
                  cfg: Config) -> ZebraTargets:
    """SSC assignment + per-positive-cell nearest-vertex correspondence.

    The corresponded vertex of a positive cell is the class vertex whose
    projection (through the matched GT pose and the crop affine) is nearest
    the cell's anchor center — the static-shape analogue of ZebraPose's
    per-pixel surface correspondence, computed per compacted positive slot.
    """
    m, s = cfg.model, cfg.solver
    cls_safe = jnp.clip(batch.class_ids, 0)
    corners = consts.kp3d[cls_safe]                               # (B,G,8,3)
    kp2d_gt = coder.project_corners(
        consts.K, batch.rotations, batch.translations, corners,
        batch.bbox_trans[:, None])                                # (B,G,8,2)
    labels, matched = ssc.ssc_assign(
        rng, batch.mask, batch.class_ids, kp2d_gt,
        input_res=m.input_res, strides=m.level_strides, sizes=m.level_sizes,
        positive_num=s.positive_num, positive_lambda=s.positive_lambda)
    pos_mask = labels > 0                                         # (B,A)

    P = s.max_pos
    sidx = jax.lax.top_k(pos_mask.astype(jnp.float32), P)[1]      # (B,P)
    s_valid = jnp.take_along_axis(pos_mask, sidx, axis=1)
    g = jnp.take_along_axis(matched, sidx, axis=1)                # (B,P)
    cls_idx = jnp.take_along_axis(cls_safe, g, axis=1)            # (B,P)

    R = jnp.take_along_axis(batch.rotations, g[..., None, None], axis=1)
    T = jnp.take_along_axis(batch.translations, g[..., None], axis=1)
    verts = consts.verts[cls_idx]                                 # (B,P,V,3)
    proj = coder.project_corners(consts.K, R, T, verts,
                                 batch.bbox_trans[:, None])       # (B,P,V,2)

    anchors = jnp.asarray(anchor_lib.make_anchors(
        m.input_res, m.level_strides, m.level_sizes))             # (A,4)
    a_sel = anchors[sidx]                                         # (B,P,4)
    center, wh = a_sel[..., :2], a_sel[..., 2:]

    d2 = jnp.sum((proj - center[..., None, :]) ** 2, axis=-1)     # (B,P,V)
    vidx = jnp.argmin(d2, axis=-1).astype(jnp.int32)              # (B,P)
    code_tgt = jnp.take_along_axis(
        consts.vert_codes[cls_idx], vidx[..., None, None], axis=2)[:, :, 0]
    pt3d = jnp.take_along_axis(verts, vidx[..., None, None], axis=2)[:, :, 0]
    pt2d = jnp.take_along_axis(proj, vidx[..., None, None], axis=2)[:, :, 0]
    off_tgt = (pt2d - center) / wh
    return ZebraTargets(labels=labels, sidx=sidx, s_valid=s_valid,
                        cls_idx=cls_idx, code_tgt=code_tgt, off_tgt=off_tgt,
                        pt3d=pt3d)


def select_cell_codes(code_pred: jnp.ndarray, sidx: jnp.ndarray,
                      cls_idx: jnp.ndarray, n_fg: int, n_bits: int):
    """Gather the (code logits, offset) of each (cell, class) pair.

    code_pred (B, A, n_fg*(n_bits+2)); sidx/cls_idx (B, P) ->
    (code_logits (B, P, n_bits), off (B, P, 2)).
    """
    B, A, _ = code_pred.shape
    sel = jnp.take_along_axis(
        code_pred, sidx[..., None], axis=1)                       # (B,P,nfg*(nb+2))
    sel = sel.reshape(B, sidx.shape[1], n_fg, n_bits + 2)
    sel = jnp.take_along_axis(
        sel, cls_idx[..., None, None], axis=2)[:, :, 0]           # (B,P,nb+2)
    return sel[..., :n_bits], sel[..., n_bits:]


def _smooth_l1(x, beta: float = 1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


class ZebraLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_code: jnp.ndarray
    loss_off: jnp.ndarray
    loss_kd: jnp.ndarray
    num_pos: jnp.ndarray


def zebra_losses(rng: jax.Array, cls_logits: jnp.ndarray,
                 code_pred: jnp.ndarray, batch: Batch, consts: TaskConsts,
                 cfg: Config, n_fg: int,
                 teacher_codes: Optional[tuple] = None) -> ZebraLossOut:
    """Focal cls (shared with the corner head) + per-bit BCE on the surface
    code + SmoothL1 on the 2D offset, all raw sums over positive slots.

    teacher_codes, when given, is (t_code_pred (B,A,n_fg*(nb+2)),
    t_cls_logits (B,A,n_fg)) from a frozen zebra teacher: the student's
    positive cells additionally match the teacher's sigmoid code
    probabilities (soft BCE) weighted by the teacher's own confidence at
    that cell — dense distillation with no OT machinery needed.
    """
    s = cfg.solver
    n_bits = cfg.model.code_bits
    tgt = zebra_targets(rng, batch, consts, cfg)

    loss_cls = sigmoid_focal_loss(cls_logits, tgt.labels,
                                  gamma=s.focal_gamma, alpha=s.focal_alpha)

    code_logits, off_pred = select_cell_codes(code_pred, tgt.sidx,
                                              tgt.cls_idx, n_fg, n_bits)
    w = tgt.s_valid.astype(jnp.float32)
    loss_code = code_bce(code_logits, tgt.code_tgt, w)
    loss_off = (_smooth_l1(off_pred - tgt.off_tgt).sum(-1) * w).sum()

    loss_kd = jnp.zeros(())
    if teacher_codes is not None:
        t_code_pred, t_cls_logits = teacher_codes
        t_logits, _ = select_cell_codes(t_code_pred, tgt.sidx, tgt.cls_idx,
                                        n_fg, n_bits)
        t_scores = jax.nn.sigmoid(t_cls_logits)                   # (B,A,nfg)
        t_conf = jnp.take_along_axis(
            jnp.take_along_axis(t_scores, tgt.sidx[..., None], axis=1),
            tgt.cls_idx[..., None], axis=2)[..., 0]               # (B,P)
        kd_w = jax.lax.stop_gradient(t_conf) * w
        loss_kd = code_bce(code_logits, jax.nn.sigmoid(t_logits), kd_w)

    return ZebraLossOut(loss_cls=loss_cls, loss_code=loss_code,
                        loss_off=loss_off, loss_kd=loss_kd,
                        num_pos=tgt.s_valid.sum())


def build_zebra_train_step(cfg: Config, consts: TaskConsts, net: PoseNet,
                           teacher_net: Optional[PoseNet], optimizer,
                           n_fg: int, distill: bool = False):
    """step_fn(state, teacher_vars, batch, rng) -> (state, metrics).

    Mirrors engine/steps.build_train_step: one XLA program containing the
    (optional) frozen zebra-teacher forward, student forward/backward and
    the optimizer update; global-sum losses so pjit over a data mesh
    inserts the gradient reductions automatically.
    """
    def step_fn(state: TrainState, teacher_vars, batch: Batch, rng: jax.Array):
        teacher = None
        if distill and teacher_net is not None:
            t_cls, _, t_code = teacher_net.apply(teacher_vars, batch.images,
                                                 train=False)
            teacher = (jax.lax.stop_gradient(t_code),
                       jax.lax.stop_gradient(t_cls))

        def loss_fn(params):
            (cls_logits, _, code_pred), mutated = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch.images, train=True, mutable=["batch_stats"])
            out = zebra_losses(rng, cls_logits, code_pred, batch, consts,
                               cfg, n_fg, teacher_codes=teacher)
            total = (cfg.solver.loss_weight_cls * out.loss_cls
                     + cfg.solver.loss_weight_code * out.loss_code
                     + cfg.solver.loss_weight_code_off * out.loss_off)
            if teacher is not None and cfg.kd.weight > 0:
                total = total + cfg.kd.weight * out.loss_kd
            return total, (out, mutated["batch_stats"])

        (total, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        metrics = {"loss_total": total, "loss_cls": out.loss_cls,
                   "loss_code": out.loss_code, "loss_off": out.loss_off,
                   "loss_kd": out.loss_kd, "num_pos": out.num_pos,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return step_fn


def build_zebra_multi_step(cfg: Config, consts: TaskConsts, net: PoseNet,
                           teacher_net: Optional[PoseNet], optimizer,
                           n_fg: int, pool_size: int, distill: bool = False):
    """K steps per dispatch over a device-resident pool (same RTT
    amortization as engine/steps.build_multi_step)."""
    step_fn = build_zebra_train_step(cfg, consts, net, teacher_net, optimizer,
                                     n_fg, distill=distill)

    def multi_fn(state: TrainState, teacher_vars, pool: Batch, rng: jax.Array,
                 start: jnp.ndarray, k: int):
        def body(carry, i):
            st, key = carry
            key, sub = jax.random.split(key)
            idx = (start + i) % pool_size
            batch = jax.tree_util.tree_map(lambda x: x[idx], pool)
            st, metrics = step_fn(st, teacher_vars, batch, sub)
            return (st, key), metrics

        (state, rng), ms = jax.lax.scan(body, (state, rng),
                                        jnp.arange(k, dtype=jnp.int32))
        metrics = jax.tree_util.tree_map(lambda m: m.mean(), ms)
        metrics["num_pos"] = ms["num_pos"][-1]
        return state, rng, metrics

    return multi_fn


def build_zebra_postprocess(cfg: Config, consts: TaskConsts, n_fg: int):
    """predict(cls_logits, code_pred, batch, rng) -> same dict contract as
    engine/postprocess.build_postprocess (R, T, score, cls, n_inliers,
    valid), but solved from DENSE decoded correspondences: the top
    `test.max_votes` cells by class score each decode to one (vertex, 2D
    point) pair; RANSAC-EPnP (+LHM) runs over those, on device.
    """
    m, t = cfg.model, cfg.test
    n_bits = cfg.model.code_bits
    anchors = jnp.asarray(anchor_lib.make_anchors(
        m.input_res, m.level_strides, m.level_sizes))             # (A,4)

    @jax.jit
    def predict(cls_logits, code_pred, batch: Batch, rng):
        B = cls_logits.shape[0]
        gt_cls = jnp.clip(batch.class_ids[:, 0], 0)               # (B,)
        scores = jax.nn.sigmoid(cls_logits)
        s = jnp.take_along_axis(scores, gt_cls[:, None, None], axis=2)[..., 0]

        K = t.max_votes
        top_s, sidx = jax.lax.top_k(s, K)                         # (B,K)
        valid = top_s > t.confidence_th

        code_logits, off = select_cell_codes(
            code_pred, sidx, jnp.broadcast_to(gt_cls[:, None], sidx.shape),
            n_fg, n_bits)                                         # (B,K,nb),(B,K,2)
        probs = jax.nn.sigmoid(code_logits)

        codes = consts.vert_codes[gt_cls]                         # (B,V,nb)
        w = 2.0 ** (-jnp.arange(n_bits, dtype=jnp.float32))
        cw = codes * w                                            # (B,V,nb)
        cost = (jnp.einsum("bki,bvi->bkv", probs, w - 2.0 * cw,
                           precision=_hp) + cw.sum(-1)[:, None, :])
        vidx = jnp.argmin(cost, axis=-1).astype(jnp.int32)        # (B,K)
        pt3d = jnp.take_along_axis(
            consts.verts[gt_cls], vidx[..., None], axis=1)        # (B,K,3)

        a_sel = anchors[sidx]                                     # (B,K,4)
        pt2d_crop = a_sel[..., :2] + off * a_sel[..., 2:]         # (B,K,2)
        inv_bt = coder.invert_bbox_trans(batch.bbox_trans)        # (B,2,3)
        A2, t2 = inv_bt[:, None, :2, :2], inv_bt[:, None, :2, 2]
        pt2d = (jnp.einsum("bnij,bnj->bni", jnp.broadcast_to(
            A2, (B, K, 2, 2)), pt2d_crop, precision=_hp) + t2)    # (B,K,2) internal

        rngs = jax.random.split(rng, B)
        R, T, n_in = jax.vmap(
            lambda p3, p2, v, r: ransac_epnp(p3, p2, v, consts.K, r,
                                             iters=t.ransac_iters,
                                             reproj_err=t.ransac_reproj_err))(
            pt3d, pt2d, valid, rngs)

        if t.lhm_iters > 0:
            from ..ops.epnp import lhm_refine, reprojection_errors
            from ..ops.smallalg import inv3
            Kf = consts.K.astype(jnp.float32)
            Kinv = inv3(Kf)

            def refine(p3, p2, v, R0, T0):
                pix = jnp.concatenate(
                    [p2, jnp.ones((p2.shape[0], 1), jnp.float32)], -1)
                rays = pix @ Kinv.T
                err = reprojection_errors(p3, p2, Kf, R0, T0)
                wgt = ((err < t.ransac_reproj_err) & v).astype(jnp.float32)
                wgt = jnp.where(wgt.sum() >= 6, wgt, v.astype(jnp.float32))
                return lhm_refine(p3, rays, wgt, R0, T0, iters=t.lhm_iters)

            R, T = jax.vmap(refine)(pt3d, pt2d, valid, R, T)

        conf = jnp.sqrt(jnp.max(jnp.where(valid, top_s, 0.0), axis=1))
        has = valid.any(-1) & (batch.class_ids[:, 0] >= 0)
        return dict(R=R, T=T, score=conf, cls=gt_cls, n_inliers=n_in,
                    valid=has, pt2d=pt2d, pt_valid=valid)

    return predict
