"""Pool-scan training (K steps per dispatch via lax.scan) vs the host loop.

Same seed, same batch cycling order, same per-step RNG split sequence. The
scan-compiled step and the standalone-jitted step fuse differently, so
float32 results differ at epsilon level and AdamW amplifies that over steps —
the single-step check is tight (and batch_stats, which bypass the optimizer,
must match to float precision); the multi-step check verifies the cycling /
partial-dispatch logic with an accumulation-tolerant bound.
"""
import itertools

import jax
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.config import Config, KDConfig, ModelConfig, SolverConfig
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.loop import train


def _setup(max_iter, val_freq=None):
    cfg = Config(
        model=ModelConfig(backbone="darknet_tiny_h", input_res=64),
        solver=SolverConfig(ims_per_batch=2, max_iter=max_iter,
                            val_freq=val_freq or max_iter, max_objs=2,
                            max_pos=32, seed=0),
        kd=KDConfig(weight=0.0),
    )
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=64,
                              max_objs=2, single_class=0, seed=0)
    pool = [ds.batch(range(b * 2, (b + 1) * 2), train=True) for b in range(3)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *pool)
    return cfg, ds.consts(), pool, stacked


def _run_both(cfg, consts, pool, stacked, tmp_path, k):
    st_host = train(cfg, consts, itertools.cycle(pool),
                    working_dir=str(tmp_path / "host"), resume=False,
                    verbose=False)
    st_pool = train(cfg, consts, None, pool=jax.device_put(stacked),
                    steps_per_dispatch=k,
                    working_dir=str(tmp_path / "pool"), resume=False,
                    verbose=False)
    return st_host, st_pool


@pytest.mark.slow
def test_pool_scan_single_step_identical(tmp_path):
    cfg, consts, pool, stacked = _setup(max_iter=1)
    st_h, st_p = _run_both(cfg, consts, pool, stacked, tmp_path, k=4)
    assert int(st_h.step) == int(st_p.step) == 1
    # data path (batch selection, masks, BN batch statistics) must be exact
    for a, b in zip(jax.tree_util.tree_leaves(st_h.batch_stats),
                    jax.tree_util.tree_leaves(st_p.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # params after one optimizer step: fusion-level float noise only
    for a, b in zip(jax.tree_util.tree_leaves(st_h.params),
                    jax.tree_util.tree_leaves(st_p.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_pool_scan_multi_dispatch_cycling(tmp_path):
    # 6 steps with k=4 exercises the partial last dispatch (4 then 2) and
    # wrap-around batch cycling over a 3-batch pool
    cfg, consts, pool, stacked = _setup(max_iter=6)
    st_h, st_p = _run_both(cfg, consts, pool, stacked, tmp_path, k=4)
    assert int(st_h.step) == int(st_p.step) == 6
    ph = jax.tree_util.tree_leaves(st_h.params)
    pp = jax.tree_util.tree_leaves(st_p.params)
    # accumulation-tolerant: epsilon-level float noise per step is amplified
    # by AdamW's adaptive normalizer (early steps have tiny second moments),
    # so bound the absolute drift at ~a few lr-sized updates, not relatively
    for a, b in zip(ph, pp):
        a, b = np.asarray(a), np.asarray(b)
        assert np.max(np.abs(a - b)) < 5e-3
    for a, b in zip(jax.tree_util.tree_leaves(st_h.batch_stats),
                    jax.tree_util.tree_leaves(st_p.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_pool_scan_dp_mesh_matches_single_device(tmp_path):
    # the same pool-scan schedule over a 4-device DP mesh must track the
    # single-device run (global-sum losses -> psum'd grads; params
    # replicated); tolerance as in the multi-dispatch test
    import dataclasses

    from kd6d_pose_adlp_tpu.parallel.mesh import make_mesh

    cfg, consts, pool, stacked = _setup(max_iter=4)
    # make_optimizer divides base_lr by the device count (reference
    # convention, libs/train_libs.py) — halve the single-device LR so both
    # runs apply identical updates
    cfg_single = cfg.replace(solver=dataclasses.replace(
        cfg.solver, base_lr=cfg.solver.base_lr / 2))
    st_single = train(cfg_single, consts, None, pool=jax.device_put(stacked),
                      steps_per_dispatch=4,
                      working_dir=str(tmp_path / "one"), resume=False,
                      verbose=False)
    st_mesh = train(cfg, consts, None, pool=stacked, mesh=make_mesh(2),
                    steps_per_dispatch=4,
                    working_dir=str(tmp_path / "mesh"), resume=False,
                    verbose=False)
    for a, b in zip(jax.tree_util.tree_leaves(st_single.params),
                    jax.tree_util.tree_leaves(st_mesh.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.max(np.abs(a - b)) < 5e-3


@pytest.mark.slow
def test_pool_scan_val_freq_boundaries(tmp_path):
    # val_freq=2 over 6 steps with k=4: dispatches must clamp to the eval
    # boundaries (2,2,2) and eval_fn must fire at steps 2, 4, 6
    cfg, consts, pool, stacked = _setup(max_iter=6, val_freq=2)
    evals = []
    st = train(cfg, consts, None, pool=jax.device_put(stacked),
               steps_per_dispatch=4,
               eval_fn=lambda state, step: evals.append(step),
               working_dir=str(tmp_path / "vf"), resume=False, verbose=False)
    assert int(st.step) == 6
    assert evals == [2, 4, 6], evals
