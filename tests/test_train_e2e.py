"""End-to-end integration: train step, KD step, eval pipeline, DP sharding."""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.config import Config, KDConfig, ModelConfig, SolverConfig, TestConfig
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.steps import (build_train_step, create_train_state,
                                             make_optimizer)
from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
from kd6d_pose_adlp_tpu.engine import evaluator
from kd6d_pose_adlp_tpu.models import anchors as anchor_lib
from kd6d_pose_adlp_tpu.models import coder
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
from kd6d_pose_adlp_tpu.data.batch import Batch


RES = 64
N_FG = 3


def small_cfg(backbone="darknet_tiny_h", kd_weight=0.0):
    return Config(
        model=ModelConfig(backbone=backbone, input_res=RES),
        solver=SolverConfig(ims_per_batch=4, base_lr=1e-3, max_iter=50,
                            max_objs=2, max_pos=32),
        test=TestConfig(max_votes=16, ransac_iters=16),
        kd=KDConfig(weight=kd_weight, max_teacher_cells=16),
    )


def small_data():
    ds = SyntheticPoseDataset(n_fg=N_FG, input_res=RES, max_objs=2,
                              single_class=1, seed=7)
    return ds


def _tiny_consts(ds):
    consts = ds.consts()
    return consts._replace(kp3d=consts.kp3d[:N_FG], diameters=consts.diameters[:N_FG])


def test_remat_step_matches_plain_step():
    """model.remat=True must change memory behavior only: one train step
    from an identical state produces identical params/metrics (jax.checkpoint
    recomputes the same forward in the backward pass)."""
    cfg = small_cfg()
    cfg_r = cfg.replace(model=dataclasses.replace(cfg.model, remat=True))
    ds = small_data()
    consts = _tiny_consts(ds)
    batch = ds.batch(range(4), train=True)
    rng = jax.random.PRNGKey(3)
    outs = []
    for c in (cfg, cfg_r):
        net = PoseNet(cfg=c.model, n_fg=N_FG)
        opt = make_optimizer(c)
        state = create_train_state(jax.random.PRNGKey(0), c, net, opt)
        step_fn = jax.jit(build_train_step(c, None, consts, net, None, opt,
                                           distill=False))
        outs.append(jax.device_get(step_fn(state, None, batch, rng)))
    (s_a, m_a), (s_b, m_b) = outs
    for k in m_a:
        np.testing.assert_allclose(m_a[k], m_b[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
        s_a.params, s_b.params)


@pytest.mark.slow
def test_baseline_train_step_reduces_loss():
    cfg = small_cfg()
    ds = small_data()
    consts = _tiny_consts(ds)
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    step_fn = jax.jit(build_train_step(cfg, None, consts, net, None, opt,
                                       distill=False), donate_argnums=(0,))
    batch = ds.batch(range(4), train=True)
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, None, batch, sub)
        losses.append(float(metrics["loss_total"]))
        assert np.isfinite(losses[-1]), (i, metrics)
    assert int(jax.device_get(metrics["num_pos"])) > 0
    # overfitting a fixed batch must reduce the loss substantially
    assert np.mean(losses[-5:]) < 0.55 * np.mean(losses[:5]), losses


@pytest.mark.slow
def test_kd_train_step_runs_with_teacher():
    cfg = small_cfg(kd_weight=5.0)
    cfg_t = small_cfg(backbone="darknet_tiny")
    ds = small_data()
    consts = _tiny_consts(ds)
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    teacher_net = PoseNet(cfg=cfg_t.model, n_fg=N_FG)
    t_vars = teacher_net.init(jax.random.PRNGKey(5), jnp.zeros((1, RES, RES, 3)))
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    step_fn = jax.jit(build_train_step(cfg, cfg_t, consts, net, teacher_net, opt,
                                       distill=True), donate_argnums=(0,))
    batch = ds.batch(range(4), train=True)
    rng = jax.random.PRNGKey(2)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, t_vars, batch, sub)
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert all(np.isfinite(v) for v in m.values()), m
    # an untrained teacher rarely clears the confidence threshold; the KD
    # term must be finite either way (zero when no teacher votes)
    assert m["loss_kd"] >= 0.0 or abs(m["loss_kd"]) < 10.0


def _fabricated_outputs(batch: Batch, consts, cfg):
    """Build (cls_logits, pred_reg) that decode EXACTLY to the GT corners."""
    m = cfg.model
    anchors = jnp.asarray(anchor_lib.make_anchors(m.input_res, m.level_strides,
                                                  m.level_sizes))
    A = anchors.shape[0]
    B = batch.images.shape[0]
    cls0 = jnp.clip(batch.class_ids[:, 0], 0)
    corners = consts.kp3d[cls0]
    kp2d = coder.project_corners(consts.K, batch.rotations[:, 0],
                                 batch.translations[:, 0], corners,
                                 batch.bbox_trans)                 # (B,8,2) crop
    enc = coder.encode(kp2d[:, None].repeat(A, 1), anchors[None])  # (B,A,16)
    reg = jnp.zeros((B, A, N_FG, 16)).at[
        jnp.arange(B)[:, None], jnp.arange(A)[None, :], cls0[:, None]].set(enc)
    # confident logits on the GT class at in-mask cells only
    cx = jnp.clip(anchors[:, 0], 0, m.input_res - 1).astype(jnp.int32)
    cy = jnp.clip(anchors[:, 1], 0, m.input_res - 1).astype(jnp.int32)
    in_mask = batch.mask[:, cy, cx] > 0                            # (B,A)
    logits = jnp.full((B, A, N_FG), -12.0)
    logits = logits.at[jnp.arange(B)[:, None], jnp.arange(A)[None, :], cls0[:, None]
                       ].set(jnp.where(in_mask, 4.0, -12.0))
    return logits, reg.reshape(B, A, N_FG * 16)


@pytest.mark.slow
def test_eval_pipeline_perfect_predictions_score_100():
    """With fabricated exact predictions the whole postprocess+eval pipeline
    (voting -> inverse crop affine -> RANSAC-EPnP -> remap -> ADD/ADI) must
    report ~100% ADI at 0.1d."""
    cfg = small_cfg()
    ds = small_data()
    consts = _tiny_consts(ds)
    postprocess = build_postprocess(cfg, consts)

    def fake_forward(variables, images):
        return fwd_outputs

    batches = []
    for start in range(0, 8, 4):
        idx = list(range(start, start + 4))
        batch = ds.batch(idx, train=False)
        metas = []
        for i in idx:
            s = ds.sample(i, train=False)
            metas.append(dict(filename=f"img_{i}.png", K=s["meta"]["K"],
                              width=s["meta"]["width"], height=s["meta"]["height"],
                              class_ids=[s["meta"]["cls"]],
                              rotations=[s["meta"]["R"]],
                              translations=[s["meta"]["T"]]))
        batches.append((batch, metas))

    meshes = [np.asarray(consts.kp3d[c]) for c in range(N_FG)]  # corner "meshes"
    all_results = []
    for batch, metas in batches:
        fwd_outputs = _fabricated_outputs(batch, consts, cfg)
        res = evaluator.valid(
            dataclasses.replace(cfg, data=dataclasses.replace(
                cfg.data, n_class=N_FG + 1,
                mesh_diameters=tuple(np.asarray(consts.diameters)))),
            consts, None, fake_forward, postprocess, [(batch, metas)],
            meshes, verbose=False)
        all_results.append(res)
    adi = [r["adi_per_class"][1].get("ADI.10d") for r in all_results
           if r["adi_per_class"][1]]
    assert adi and all(a == 100.0 for a in adi), all_results[0]["table"]


@pytest.mark.slow
def test_dp_sharded_train_step_8_devices():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from kd6d_pose_adlp_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    cfg = small_cfg()
    ds = small_data()
    consts = _tiny_consts(ds)
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    opt = make_optimizer(cfg, n_devices=8)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    mesh = make_mesh(8)
    state = replicate(state, mesh)
    step_fn = jax.jit(build_train_step(cfg, None, consts, net, None, opt,
                                       distill=False))
    batch = shard_batch(ds.batch(range(8), train=True), mesh)
    state2, metrics = step_fn(state, None, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss_total"]))
    # gradient sync: params identical on every device (fixes the reference's
    # dead-DDP quirk, SURVEY 2.10)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def _fabricated_outputs_multi(batch: Batch, consts, cfg):
    """Like _fabricated_outputs but encodes EVERY object slot's corners at
    its own instance-mask cells (mask ids 1..G), enabling detection-style
    multi-class postprocess tests."""
    m = cfg.model
    anchors = jnp.asarray(anchor_lib.make_anchors(m.input_res, m.level_strides,
                                                  m.level_sizes))
    A = anchors.shape[0]
    B, G = batch.class_ids.shape
    cx = jnp.clip(anchors[:, 0], 0, m.input_res - 1).astype(jnp.int32)
    cy = jnp.clip(anchors[:, 1], 0, m.input_res - 1).astype(jnp.int32)
    inst = batch.mask[:, cy, cx]                                    # (B,A)
    logits = jnp.full((B, A, N_FG), -12.0)
    reg = jnp.zeros((B, A, N_FG, 16))
    for g in range(G):
        cls_g = jnp.clip(batch.class_ids[:, g], 0)
        corners = consts.kp3d[cls_g]
        kp2d = coder.project_corners(consts.K, batch.rotations[:, g],
                                     batch.translations[:, g], corners,
                                     batch.bbox_trans)
        enc = coder.encode(kp2d[:, None].repeat(A, 1), anchors[None])
        on = (inst == g + 1) & (batch.class_ids[:, g:g + 1] >= 0)   # (B,A)
        bi = jnp.arange(B)[:, None]
        ai = jnp.arange(A)[None, :]
        logits = logits.at[bi, ai, cls_g[:, None]].max(
            jnp.where(on, 4.0, -12.0))
        reg = reg.at[bi, ai, cls_g[:, None]].set(
            jnp.where(on[..., None], enc, reg[bi, ai, cls_g[:, None]]))
    return logits, reg.reshape(B, A, N_FG * 16)


@pytest.mark.slow
def test_multiclass_postprocess_recovers_both_objects():
    """Detection-style eval (VERDICT r1 weak 5): on a genuinely 2-object crop
    with distinct classes, build_postprocess_multi must return valid poses
    for BOTH classes within ADI-0.1d, and invalid for absent classes."""
    from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess_multi
    from kd6d_pose_adlp_tpu.utils import geometry as geo

    cfg = small_cfg()
    ds = small_data()
    consts = _tiny_consts(ds)
    K = np.asarray(consts.K)
    res = cfg.model.input_res

    # hand-built 2-object scene (the synthetic dataset renders one object
    # per scene; the postprocess only needs masks/poses, not pixels)
    rng = np.random.default_rng(4)
    cls = np.array([0, 2], np.int32)
    Rs, Ts, kp_int = [], [], []
    for g, dx in enumerate((-90.0, 90.0)):
        R = geo.quaternion2rotation(rng.normal(size=4)).astype(np.float32)
        T = np.array([dx, 0.0, 800.0], np.float32)
        Rs.append(R)
        Ts.append(T)
        kp_int.append(geo.project_points(K, R, T, np.asarray(consts.kp3d[cls[g]])))
    both = np.concatenate(kp_int, 0)
    lo, hi = both.min(0), both.max(0)
    center = (lo + hi) / 2
    scale = float(max(hi - lo) * 1.4)
    M = geo.dzi_affine(center, scale, res)                     # (2,3)

    mask = np.zeros((res, res), np.int32)
    for g in range(2):
        crop = geo.apply_affine(M, kp_int[g])
        x0, y0 = np.clip(crop.min(0).astype(int), 0, res - 1)
        x1, y1 = np.clip(crop.max(0).astype(int) + 1, 1, res)
        mask[y0:y1, x0:x1] = g + 1

    G = 2
    batch = Batch(
        images=jnp.zeros((1, res, res, 3), jnp.float32),
        mask=jnp.asarray(mask)[None],
        class_ids=jnp.asarray(cls)[None],
        rotations=jnp.asarray(np.stack(Rs))[None],
        translations=jnp.asarray(np.stack(Ts))[None],
        bbox_trans=jnp.asarray(M, jnp.float32)[None])

    logits, reg = _fabricated_outputs_multi(batch, consts, cfg)
    predict = build_postprocess_multi(cfg, consts, N_FG)
    out = predict(logits, reg, batch, jax.random.PRNGKey(0))

    diam = np.asarray(consts.diameters)
    img = 0
    for g in range(G):
        c = int(cls[g])
        assert bool(out["valid"][img, c]), (g, c)
        Rp = np.asarray(out["R"][img, c], np.float64)
        Tp = np.asarray(out["T"][img, c], np.float64)
        pts = np.asarray(consts.kp3d[c], np.float64)
        add = np.linalg.norm((pts @ Rp.T + Tp)
                             - (pts @ np.asarray(Rs[g], np.float64).T
                                + np.asarray(Ts[g], np.float64)), axis=-1).mean()
        assert add < 0.1 * diam[c], (c, add, diam[c])
    for c in range(N_FG):
        if c not in set(cls.tolist()):
            assert not bool(out["valid"][img, c]), c
