"""Dense binary-code head (ZebraPose-style, BASELINE.json configs[5]).

Covers the code construction invariants, the MXU decode's tree-walk
equivalence, target assignment geometry, and one tiny end-to-end train +
postprocess step (shapes + finiteness + gradient flow into the code head).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kd6d_pose_adlp_tpu.config import Config, ModelConfig, SolverConfig
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset, make_box_corners
from kd6d_pose_adlp_tpu.ops.binary_code import (build_codes, code_bce,
                                                decode_vertex,
                                                sample_box_surface)

N_BITS = 10


def _verts():
    return sample_box_surface(make_box_corners(2)[0], 5)


def test_codes_unique_and_balanced():
    v = _verts()
    codes = build_codes(v, N_BITS)
    assert codes.shape == (len(v), N_BITS)
    assert set(np.unique(codes)) <= {0.0, 1.0}
    # prefix-unique once V <= 2^n_bits
    assert len({tuple(c) for c in codes.astype(int)}) == len(v)
    # every split is balanced: bit 0 exactly half (within 1 for odd groups)
    assert abs(codes[:, 0].sum() - len(v) / 2) <= 0.5


def test_decode_is_tree_walk_on_hard_bits():
    v = _verts()
    codes = jnp.asarray(build_codes(v, N_BITS))
    idx = np.asarray(decode_vertex(codes, codes))
    assert (idx == np.arange(len(v))).all()


def test_decode_msb_dominates():
    """A vertex whose code agrees on the first bits must beat one that
    differs early but agrees late — the 2^-i weighting makes the decode a
    greedy partition-tree walk."""
    codes = jnp.asarray([[0, 0, 0, 0], [0, 0, 1, 1], [1, 0, 0, 0]],
                        jnp.float32)
    # query agrees with row 1 on bits (0,1) and with row 2 on bits (1,2,3)
    q = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    assert int(decode_vertex(q, codes)[0]) == 1


def test_code_bce_matches_oracle():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(4, 6)).astype(np.float32)
    t = (rng.random((4, 6)) > 0.5).astype(np.float32)
    w = np.asarray([1.0, 0.0, 1.0, 1.0], np.float32)
    got = float(code_bce(jnp.asarray(z), jnp.asarray(t), jnp.asarray(w)))
    p = 1.0 / (1.0 + np.exp(-z))
    ref = -(t * np.log(p) + (1 - t) * np.log(1 - p)).sum(-1)
    assert np.isclose(got, (ref * w).sum(), rtol=1e-5)


def _cfg(code_bits=8, res=128):
    return Config(
        model=ModelConfig(backbone="darknet_tiny_h", input_res=res,
                          code_bits=code_bits),
        solver=SolverConfig(ims_per_batch=2, max_iter=4, max_pos=16),
    )


def test_zebra_targets_geometry():
    """The corresponded vertex's projection must be the nearest vertex
    projection to the cell's anchor center, and the offset target must
    reconstruct it exactly."""
    from kd6d_pose_adlp_tpu.engine.zebra import zebra_targets
    from kd6d_pose_adlp_tpu.models import anchors as anchor_lib
    from kd6d_pose_adlp_tpu.models import coder

    cfg = _cfg()
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts(code_bits=cfg.model.code_bits)
    batch = ds.batch(range(2), train=True)
    tgt = jax.device_get(zebra_targets(jax.random.PRNGKey(0), batch, consts,
                                       cfg))
    m = cfg.model
    anchors = anchor_lib.make_anchors(m.input_res, m.level_strides,
                                      m.level_sizes)
    assert tgt.s_valid.any(), "no positive cells in the smoke batch"
    for b in range(2):
        for p in np.flatnonzero(tgt.s_valid[b])[:5]:
            c = int(tgt.cls_idx[b, p])
            verts = np.asarray(consts.verts[c])
            R = np.asarray(batch.rotations)[b, 0]
            T = np.asarray(batch.translations)[b, 0]
            proj = np.asarray(jax.device_get(coder.project_corners(
                consts.K, jnp.asarray(R), jnp.asarray(T),
                jnp.asarray(verts), jnp.asarray(
                    np.asarray(batch.bbox_trans)[b]))))
            center = anchors[tgt.sidx[b, p], :2]
            wh = anchors[tgt.sidx[b, p], 2:]
            d = np.linalg.norm(proj - center, axis=-1)
            # offset target reconstructs the argmin vertex's projection
            rec = center + tgt.off_tgt[b, p] * wh
            assert np.linalg.norm(proj[d.argmin()] - rec) < 1e-2
            # and the 3D point is that vertex
            assert np.linalg.norm(verts[d.argmin()] - tgt.pt3d[b, p]) < 1e-4


def test_zebra_train_step_and_postprocess():
    from kd6d_pose_adlp_tpu.engine.steps import (create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.engine.zebra import (build_zebra_postprocess,
                                                 build_zebra_train_step)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    cfg = _cfg()
    n_fg = cfg.data.n_fg
    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts(code_bits=cfg.model.code_bits)
    batch = ds.batch(range(2), train=True)

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    assert "code_pred" in state.params["head"], "code head missing"

    step = jax.jit(build_zebra_train_step(cfg, consts, net, None, opt, n_fg))
    state2, m = step(state, None, batch, jax.random.PRNGKey(1))
    m = jax.device_get(m)
    for k in ("loss_total", "loss_cls", "loss_code", "loss_off"):
        assert np.isfinite(m[k]), (k, m[k])
    assert m["num_pos"] > 0
    # gradient must flow into the code head
    w0 = np.asarray(state.params["head"]["code_pred"]["kernel"])
    w1 = np.asarray(state2.params["head"]["code_pred"]["kernel"])
    assert not np.allclose(w0, w1)

    post = build_zebra_postprocess(cfg, consts, n_fg)
    variables = {"params": state2.params, "batch_stats": state2.batch_stats}
    cls_l, _, code_p = net.apply(variables, batch.images, train=False)
    out = jax.device_get(post(cls_l, code_p, batch, jax.random.PRNGKey(2)))
    assert out["R"].shape == (2, 3, 3) and out["T"].shape == (2, 3)
    assert np.isfinite(out["R"]).all() and np.isfinite(out["T"]).all()
    # rotations are orthonormal
    RtR = np.einsum("bij,bik->bjk", out["R"], out["R"])
    assert np.abs(RtR - np.eye(3)).max() < 1e-3


def test_zebra_postprocess_oracle_roundtrip():
    """Feeding PERFECT per-cell predictions (GT codes as saturated logits,
    GT offsets, GT-class scores) through the dense postprocess must recover
    the GT pose — separates 'undertrained network' from 'broken decode/PnP'
    when a training run scores at the floor."""
    from kd6d_pose_adlp_tpu.engine.zebra import (build_zebra_postprocess,
                                                 zebra_targets)

    cfg = _cfg()
    n_fg, n_bits = cfg.data.n_fg, cfg.model.code_bits
    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts(code_bits=n_bits)
    batch = ds.batch(range(2), train=False)
    tgt = jax.device_get(zebra_targets(jax.random.PRNGKey(0), batch, consts,
                                       cfg))
    assert (tgt.s_valid.sum(1) >= 6).all(), "need >=6 positives for PnP"

    B, A = tgt.labels.shape
    cls_logits = np.full((B, A, n_fg), -10.0, np.float32)
    code_pred = np.zeros((B, A, n_fg * (n_bits + 2)), np.float32)
    for b in range(B):
        for p in np.flatnonzero(tgt.s_valid[b]):
            a, c = int(tgt.sidx[b, p]), int(tgt.cls_idx[b, p])
            cls_logits[b, a, c] = 10.0
            base = c * (n_bits + 2)
            code_pred[b, a, base:base + n_bits] = (
                2.0 * tgt.code_tgt[b, p] - 1.0) * 10.0
            code_pred[b, a, base + n_bits:base + n_bits + 2] = tgt.off_tgt[b, p]

    post = build_zebra_postprocess(cfg, consts, n_fg)
    out = jax.device_get(post(jnp.asarray(cls_logits), jnp.asarray(code_pred),
                              batch, jax.random.PRNGKey(3)))
    for b in range(B):
        gtR = np.asarray(batch.rotations)[b, 0]
        gtT = np.asarray(batch.translations)[b, 0]
        assert np.abs(out["R"][b] - gtR).max() < 0.02, (b, out["R"][b], gtR)
        assert np.abs(out["T"][b] - gtT).max() < 5.0, (b, out["T"][b], gtT)


def test_zebra_multi_step_matches_single_steps():
    """The pool-scan multi-step (K steps per dispatch) must produce the
    same parameters as K sequential single steps with the same key
    schedule — the same data-path equivalence pinned for the corner
    pipeline's engine/steps.build_multi_step."""
    from kd6d_pose_adlp_tpu.engine.steps import (create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.engine.zebra import (build_zebra_multi_step,
                                                 build_zebra_train_step)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    cfg = _cfg()
    n_fg = cfg.data.n_fg
    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts(code_bits=cfg.model.code_bits)
    host = [ds.batch(range(2 * b, 2 * b + 2), train=True) for b in range(2)]
    pool = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *host)

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)
    opt = make_optimizer(cfg)
    state0 = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    rng0 = jax.random.PRNGKey(5)

    multi = jax.jit(build_zebra_multi_step(cfg, consts, net, None, opt, n_fg,
                                           pool_size=2), static_argnums=(5,))
    m_state, _, _ = multi(state0, None, pool, rng0,
                          jnp.asarray(0, jnp.int32), 2)

    step = jax.jit(build_zebra_train_step(cfg, consts, net, None, opt, n_fg))
    s_state, key = state0, rng0
    for i in range(2):
        key, sub = jax.random.split(key)
        batch = jax.tree_util.tree_map(lambda x: x[i], pool)
        s_state, _ = step(s_state, None, batch, sub)

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        m_state.params, s_state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5, diffs


def test_zebra_dense_kd_step():
    """Distillation arm: a frozen zebra teacher's code probabilities feed
    the soft-BCE term; loss_kd must be finite and nonzero when the teacher
    is confident somewhere."""
    from kd6d_pose_adlp_tpu.engine.steps import (create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.engine.zebra import build_zebra_train_step
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    cfg = _cfg()
    n_fg = cfg.data.n_fg
    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts(code_bits=cfg.model.code_bits)
    batch = ds.batch(range(2), train=True)

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)
    t_net = PoseNet(cfg=cfg.model, n_fg=n_fg)  # same arch teacher
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    t_vars = t_net.init(jax.random.PRNGKey(7),
                        jnp.zeros((1, cfg.model.input_res,
                                   cfg.model.input_res, 3)))

    step = jax.jit(build_zebra_train_step(cfg, consts, net, t_net, opt, n_fg,
                                          distill=True))
    _, m = step(state, t_vars, batch, jax.random.PRNGKey(1))
    m = jax.device_get(m)
    assert np.isfinite(m["loss_kd"]) and m["loss_kd"] > 0
