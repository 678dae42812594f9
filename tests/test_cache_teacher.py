"""Frozen-teacher knowledge caching (engine/steps.precompute_pool_votes).

A static device pool + a frozen teacher means the teacher's voted knowledge
per pool entry is constant across epochs; caching it must reproduce the
live-teacher KD step exactly up to cross-program fusion noise. (The
reference cannot make this optimization — its DZI augmentation re-crops
every epoch, dataset/dataset.py — so there is no reference counterpart;
this is a TPU-first training-throughput feature.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.config import (Config, KDConfig, ModelConfig,
                                       SolverConfig, TestConfig)
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.steps import (build_multi_step,
                                             create_train_state,
                                             make_optimizer,
                                             precompute_pool_votes,
                                             teacher_votes)
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet


def _setup(pool_batches=3, bs=2):
    cfg = Config(
        model=ModelConfig(backbone="darknet_tiny_h", input_res=64),
        solver=SolverConfig(ims_per_batch=bs, max_iter=8, val_freq=8,
                            max_objs=2, max_pos=32, seed=0),
        kd=KDConfig(weight=1.0, max_teacher_cells=16, use_pallas=False),
    )
    cfg_t = Config(
        model=ModelConfig(backbone="darknet_tiny", input_res=64),
        solver=cfg.solver, kd=cfg.kd,
        # a fresh-init teacher scores ~0.01 everywhere (focal prior bias);
        # drop the voting threshold so teacher votes exist in this test
        test=TestConfig(confidence_th=0.005))
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=64,
                              max_objs=2, single_class=0, seed=0)
    batches = [ds.batch(range(b * bs, (b + 1) * bs), train=True)
               for b in range(pool_batches)]
    pool = jax.device_put(jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches))
    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    teacher_net = PoseNet(cfg=cfg_t.model, n_fg=cfg.data.n_fg)
    t_vars = teacher_net.init(jax.random.PRNGKey(7),
                              jnp.zeros((1, 64, 64, 3)))
    return cfg, cfg_t, ds.consts(), pool, net, teacher_net, t_vars


def test_pool_votes_match_per_batch():
    cfg, cfg_t, consts, pool, net, teacher_net, t_vars = _setup()
    cached = precompute_pool_votes(cfg, cfg_t, teacher_net, t_vars, pool)
    assert cached.score.shape[0] == 3
    for i in range(3):
        batch = jax.tree_util.tree_map(lambda x: x[i], pool)
        live = jax.jit(lambda tv, b: teacher_votes(
            cfg, cfg_t, teacher_net, tv, b))(t_vars, batch)
        for name, a, b in zip(live._fields, live,
                              jax.tree_util.tree_map(lambda x: x[i], cached)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=f"votes field {name} batch {i}")


@pytest.mark.slow
def test_cached_multi_step_matches_live():
    cfg, cfg_t, consts, pool, net, teacher_net, t_vars = _setup()
    opt = make_optimizer(cfg)
    state0 = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    rng = jax.random.PRNGKey(3)
    start = jnp.zeros((), jnp.int32)
    k = 4  # exercises pool wrap-around (3-batch pool)

    live_fn = jax.jit(build_multi_step(cfg, cfg_t, consts, net, teacher_net,
                                       opt, distill=True, pool_size=3),
                      static_argnums=(5,))
    st_live, _, m_live = live_fn(state0, t_vars, pool, rng, start, k)

    cached = precompute_pool_votes(cfg, cfg_t, teacher_net, t_vars, pool)
    cache_fn = jax.jit(build_multi_step(cfg, cfg_t, consts, net, None, opt,
                                        distill=True, pool_size=3,
                                        cached_votes=True),
                       static_argnums=(5,))
    st_cache, _, m_cache = cache_fn(state0, cached, pool, rng, start, k)

    assert float(m_live["loss_kd"]) > 0  # distillation actually active
    for key in ("loss_total", "loss_cls", "loss_reg", "loss_kd"):
        np.testing.assert_allclose(float(m_live[key]), float(m_cache[key]),
                                   rtol=1e-4, err_msg=key)
    # end state: same data path; only cross-program fusion noise admitted,
    # amplified by AdamW's adaptive normalizer over k steps
    for a, b in zip(jax.tree_util.tree_leaves(st_live.params),
                    jax.tree_util.tree_leaves(st_cache.params)):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 5e-3
    for a, b in zip(jax.tree_util.tree_leaves(st_live.batch_stats),
                    jax.tree_util.tree_leaves(st_cache.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_cache_teacher_dp_mesh(tmp_path):
    # cached-votes multi-step over a 2-device DP mesh: the votes cache is
    # computed from the sharded pool inside jit (sharding propagates) and
    # the run must track the single-device cached run
    import dataclasses

    from kd6d_pose_adlp_tpu.engine.loop import train
    from kd6d_pose_adlp_tpu.parallel.mesh import make_mesh

    cfg, cfg_t, consts, pool, net, teacher_net, t_vars = _setup()
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, max_iter=4))
    # make_optimizer divides base_lr by device count; halve the
    # single-device LR so both runs apply identical updates
    cfg_single = cfg.replace(solver=dataclasses.replace(
        cfg.solver, base_lr=cfg.solver.base_lr / 2))
    st_one = train(cfg_single, consts, None, cfg_t=cfg_t,
                   teacher_variables=t_vars, pool=pool,
                   steps_per_dispatch=4, cache_teacher=True,
                   working_dir=str(tmp_path / "one"), resume=False,
                   verbose=False)
    st_mesh = train(cfg, consts, None, cfg_t=cfg_t, teacher_variables=t_vars,
                    pool=jax.device_get(pool), mesh=make_mesh(2),
                    steps_per_dispatch=4, cache_teacher=True,
                    working_dir=str(tmp_path / "mesh"), resume=False,
                    verbose=False)
    for a, b in zip(jax.tree_util.tree_leaves(st_one.params),
                    jax.tree_util.tree_leaves(st_mesh.params)):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 5e-3


@pytest.mark.slow
def test_train_loop_cache_teacher_smoke(tmp_path):
    # loop-level wiring: train() with cache_teacher=True runs end to end
    from kd6d_pose_adlp_tpu.engine.loop import train
    cfg, cfg_t, consts, pool, net, teacher_net, t_vars = _setup()
    st = train(cfg, consts, None, cfg_t=cfg_t, teacher_variables=t_vars,
               pool=pool, steps_per_dispatch=4, cache_teacher=True,
               working_dir=str(tmp_path), resume=False, verbose=False)
    assert int(st.step) == cfg.solver.max_iter
