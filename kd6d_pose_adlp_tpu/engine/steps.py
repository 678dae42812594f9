"""Compiled train/eval steps.

One `jit`-compiled program per step containing: teacher forward (stop-grad),
teacher-knowledge voting, student forward/backward, loss weighting, gradient
clipping, AdamW with OneCycle LR/momentum — the reference splits this across
`train_kd.py:104-140` with host round-trips; here it is a single XLA program.

SPMD: the step is jitted over a 1-D `Mesh('data')` with batch-sharded inputs
and replicated params. All losses are global sums, so XLA inserts the
cross-device reductions automatically — this *fixes* the reference's dead-DDP
quirk (SURVEY §2.10) where gradients were never synchronized.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..data.batch import Batch, TaskConsts
from ..models.pose_net import PoseNet
from ..ops.object_space import select_class_pred
from ..ops.voting import Votes, vote_cells, votes_to_internal_frame
from .losses import pose_losses
from .schedule import onecycle_linear_lr


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: Config, n_devices: int = 1):
    """AdamW(wd=1e-4, constant betas) + OneCycle linear LR + grad-clip 1.0
    (reference libs/train_libs.py:119-120: AdamW defaults with
    OneCycleLR(cycle_momentum=False) — beta1 stays 0.9; LR divided by world
    size as the reference does)."""
    total = cfg.solver.max_iter + 100  # reference passes MAX_ITER+100
    lr = onecycle_linear_lr(cfg.solver.base_lr / n_devices, total)
    return optax.chain(
        optax.clip_by_global_norm(cfg.solver.grad_clip),
        optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.solver.weight_decay),
    )


def create_train_state(rng: jax.Array, cfg: Config, net: PoseNet,
                       optimizer) -> TrainState:
    x = jnp.zeros((1, cfg.model.input_res, cfg.model.input_res, 3), jnp.float32)
    variables = net.init(rng, x)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=optimizer.init(params))


def teacher_knowledge(t_cls: jnp.ndarray, t_reg: jnp.ndarray, batch: Batch,
                      cfg_t: Config, max_votes: int,
                      teacher_class: str = "gt") -> Votes:
    """Teacher voted-cell extraction (reference PostProcessorKD,
    `postprocess/postprocess_kd.py` + `models/model_kd.py:83-92`).

    `teacher_class="gt"` gathers the image's GT class — identical to the
    reference's first-candidate label on single-object LINEMOD scenes.
    `teacher_class="pred"` votes the class of the teacher's best-scoring
    (anchor, class) pair, the reference's own semantics (it sorts candidate
    cells by score and takes the first one's label) — required when a
    multi-class teacher distills scenes whose content it must infer.
    The teacher-side RANSAC-PnP is skipped in both modes since its R|T
    outputs are never consumed by the KD loss (documented deviation).
    """
    m = cfg_t.model
    scores = jax.nn.sigmoid(t_cls)                                # (B,A,nfg)
    if teacher_class == "pred":
        B = scores.shape[0]
        best = jnp.argmax(scores.reshape(B, -1), axis=1)          # over A*nfg
        voted_cls = (best % scores.shape[2]).astype(jnp.int32)    # (B,)
    else:
        voted_cls = jnp.clip(batch.class_ids[:, 0], 0)            # (B,)
    s = jnp.take_along_axis(scores, voted_cls[:, None, None], axis=2)[..., 0]
    pred16 = select_class_pred(t_reg, jnp.broadcast_to(
        voted_cls[:, None], s.shape))                             # (B,A,16)
    votes = vote_cells(
        s, pred16, input_res=m.input_res, strides=m.level_strides,
        all_sizes=m.anchor_sizes, confidence_th=cfg_t.test.confidence_th,
        positive_num=cfg_t.solver.positive_num,
        positive_lambda=cfg_t.solver.positive_lambda, max_votes=max_votes)
    kp_internal = votes_to_internal_frame(votes, batch.bbox_trans)
    valid = votes.valid & (batch.class_ids[:, :1] >= 0)
    return Votes(kp2d=kp_internal, score=votes.score, valid=valid,
                 box_size=votes.box_size)


def build_train_step(cfg: Config, cfg_t: Optional[Config], consts: TaskConsts,
                     net: PoseNet, teacher_net: Optional[PoseNet], optimizer,
                     distill: bool = True, cached_votes: bool = False):
    """Returns step_fn(state, teacher_vars, batch, rng) -> (state, metrics).

    With distill=False (kd_weight 0 baseline, reference train.sh:3) the
    teacher is skipped entirely. With cached_votes=True the second argument
    is a precomputed `Votes` for this batch instead of teacher variables
    (frozen-teacher knowledge caching, see precompute_pool_votes) and the
    teacher forward drops out of the step.
    """

    w_img, h_img = float(cfg.data.internal_width), float(cfg.data.internal_height)

    def fwd_train(params, stats, images):
        return net.apply({"params": params, "batch_stats": stats},
                         images, train=True, mutable=["batch_stats"])
    if getattr(cfg.model, "remat", False):
        # full-forward rematerialization: store (almost) no activations,
        # recompute the forward inside the backward pass — the standard
        # HBM-for-FLOPs trade for batch sizes past the activation ceiling
        fwd_train = jax.checkpoint(fwd_train)

    def step_fn(state: TrainState, teacher_vars, batch: Batch, rng: jax.Array):
        teacher = None
        if distill and cached_votes:
            teacher = (teacher_vars, w_img, h_img)  # teacher_vars IS Votes
        elif distill and teacher_net is not None:
            t_cls, t_reg = teacher_net.apply(teacher_vars, batch.images, train=False)
            votes = teacher_knowledge(
                jax.lax.stop_gradient(t_cls), jax.lax.stop_gradient(t_reg),
                batch, cfg_t, cfg.kd.max_teacher_cells,
                teacher_class=cfg.kd.teacher_class)
            teacher = (votes, w_img, h_img)

        def loss_fn(params):
            (cls_logits, pred_reg), mutated = fwd_train(
                params, state.batch_stats, batch.images)
            out = pose_losses(rng, cls_logits, pred_reg, batch, consts, cfg,
                              teacher=teacher)
            total = (cfg.solver.loss_weight_cls * out.loss_cls
                     + cfg.solver.loss_weight_reg * out.loss_reg)
            if teacher is not None and cfg.kd.weight > 0:
                total = total + cfg.kd.weight * out.loss_kd
            return total, (out, mutated["batch_stats"])

        (total, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        metrics = {
            "loss_total": total,
            "loss_cls": out.loss_cls,
            "loss_reg": out.loss_reg,
            "loss_kd": out.loss_kd,
            "num_pos": out.num_pos,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return step_fn


def teacher_votes(cfg: Config, cfg_t: Config, teacher_net: PoseNet,
                  teacher_vars, batch: Batch) -> Votes:
    """Teacher forward + voted-knowledge extraction for one batch (the
    distillation step's teacher half, as a standalone computation)."""
    t_cls, t_reg = teacher_net.apply(teacher_vars, batch.images, train=False)
    return teacher_knowledge(
        jax.lax.stop_gradient(t_cls), jax.lax.stop_gradient(t_reg),
        batch, cfg_t, cfg.kd.max_teacher_cells,
        teacher_class=cfg.kd.teacher_class)


def precompute_pool_votes(cfg: Config, cfg_t: Config, teacher_net: PoseNet,
                          teacher_vars, pool: Batch) -> Votes:
    """Frozen-teacher knowledge for a device-resident batch pool, ONCE.

    The teacher is frozen and a pool is static, so its voted knowledge per
    pool entry is constant across epochs — recomputing it every step (the
    reference must: DZI re-crops each epoch, `dataset/dataset.py` getitem)
    spends ~70% of the KD step's FLOPs (darknet53 teacher 2,119 of 2,988
    GFLOP, BASELINE.md) on identical results. One sequential `lax.map`
    bounds peak memory at a single teacher activation set; the returned
    Votes pytree (leading pool axis) is ~100x smaller than the pool images.
    """
    @jax.jit
    def all_votes(tv, pl):
        return jax.lax.map(lambda b: teacher_votes(cfg, cfg_t, teacher_net,
                                                   tv, b), pl)
    return all_votes(teacher_vars, pool)


def build_multi_step(cfg: Config, cfg_t: Optional[Config], consts: TaskConsts,
                     net: PoseNet, teacher_net: Optional[PoseNet], optimizer,
                     distill: bool, pool_size: int,
                     cached_votes: bool = False):
    """K train steps per host dispatch: `lax.scan` over a device-resident
    batch pool (a Batch pytree with a leading (pool_size,) axis).

    On the remote-tunnel TPU each host->device dispatch costs ~30 ms of RTT,
    capping a host-driven loop at ~30 steps/s no matter how fast the step
    itself is (974 img/s compiled step vs 435 img/s observed loop). Scanning K
    steps inside one program amortizes the RTT K-fold. Batches are selected
    as pool[(start + i) % pool_size] — the same cycling order the host loop
    uses. Returns multi_fn(state, teacher_vars, pool, rng, start, k) with k
    static; metrics are the per-step means (and num_pos of the last step).
    """
    step_fn = build_train_step(cfg, cfg_t, consts, net, teacher_net, optimizer,
                               distill=distill, cached_votes=cached_votes)

    def multi_fn(state: TrainState, teacher_vars, pool: Batch, rng: jax.Array,
                 start: jnp.ndarray, k: int):
        def body(carry, i):
            st, key = carry
            key, sub = jax.random.split(key)
            idx = (start + i) % pool_size
            batch = jax.tree_util.tree_map(lambda x: x[idx], pool)
            tv = teacher_vars
            if cached_votes:  # teacher_vars = pool-wide Votes; pick the batch
                tv = jax.tree_util.tree_map(lambda x: x[idx], teacher_vars)
            st, metrics = step_fn(st, tv, batch, sub)
            return (st, key), metrics

        (state, rng), ms = jax.lax.scan(body, (state, rng),
                                        jnp.arange(k, dtype=jnp.int32))
        metrics = jax.tree_util.tree_map(lambda m: m.mean(), ms)
        metrics["num_pos"] = ms["num_pos"][-1]
        return state, rng, metrics

    return multi_fn


def build_kd_debug(cfg: Config, cfg_t: Config, consts: TaskConsts,
                   net: PoseNet, teacher_net: PoseNet):
    """Jitted extractor of the OT point clouds for visualization (the
    reference plots them from inside the loss every 1000 steps,
    losses/kd_loss.py:88-97). Returns (x, y, a, b, img_valid) for a batch."""
    from .losses import build_kd_clouds, prepare_targets
    from ..models import anchors as anchor_lib
    from ..models import coder
    from ..ops.object_space import select_class_pred

    w_img, h_img = float(cfg.data.internal_width), float(cfg.data.internal_height)

    @jax.jit
    def debug_fn(variables, teacher_vars, batch: Batch, rng):
        t_cls, t_reg = teacher_net.apply(teacher_vars, batch.images, train=False)
        votes = teacher_knowledge(t_cls, t_reg, batch, cfg_t,
                                  cfg.kd.max_teacher_cells,
                                  teacher_class=cfg.kd.teacher_class)
        cls_logits, pred_reg = net.apply(variables, batch.images, train=False)
        tgt = prepare_targets(rng, batch, consts, cfg)
        anchors = jnp.asarray(anchor_lib.make_anchors(
            cfg.model.input_res, cfg.model.level_strides, cfg.model.level_sizes))
        pred16 = select_class_pred(pred_reg, tgt.cls_idx)
        inv_bt = coder.invert_bbox_trans(batch.bbox_trans)
        pred_xy = coder.decode(pred16, anchors, inv_bt[:, None])
        return build_kd_clouds(cls_logits, pred_xy, tgt,
                               Votes(kp2d=votes.kp2d, score=votes.score,
                                     valid=votes.valid, box_size=votes.box_size),
                               cfg, w=w_img, h=h_img)

    return debug_fn


def build_forward(cfg: Config, net: PoseNet):
    """Plain eval-mode forward producing flat (cls, reg)."""

    @jax.jit
    def fwd(variables, images):
        return net.apply(variables, images, train=False)

    return fwd
