"""DP weak-scaling invariance and eval-gather coverage (VERDICT r1 item 8).

The reference's DP semantics (libs/distributed.py:44-76, losses/loss.py:45-51)
all-reduce positive counts and average gradients; under jit+sharding the
compiled program has *global* semantics, so the same global batch must give
the same loss/params whether it runs on 1 device or sharded over 8 — up to
float reduction order only.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.config import Config, KDConfig, ModelConfig, SolverConfig, TestConfig
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.steps import (build_train_step, create_train_state,
                                             make_optimizer)
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
from kd6d_pose_adlp_tpu.parallel.mesh import (gather_eval_pytree, make_mesh,
                                              replicate, shard_batch)

RES = 64
N_FG = 3


def _cfg():
    return Config(
        model=ModelConfig(backbone="darknet_tiny_h", input_res=RES),
        solver=SolverConfig(ims_per_batch=8, base_lr=1e-3, max_iter=50,
                            max_objs=2, max_pos=32),
        test=TestConfig(max_votes=16, ransac_iters=16),
        kd=KDConfig(weight=0.0, max_teacher_cells=16),
    )


@pytest.mark.slow
def test_weak_scaling_1_vs_8_devices_same_global_batch():
    """Same global batch of 8: loss and updated params agree between an
    unsharded run and an 8-way batch-sharded run."""
    cfg = _cfg()
    ds = SyntheticPoseDataset(n_fg=N_FG, input_res=RES, max_objs=2,
                              single_class=1, seed=7)
    consts = ds.consts()
    consts = consts._replace(kp3d=consts.kp3d[:N_FG],
                             diameters=consts.diameters[:N_FG])
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    opt = make_optimizer(cfg, n_devices=8)
    state0 = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    step_fn = jax.jit(build_train_step(cfg, None, consts, net, None, opt,
                                       distill=False))
    batch = ds.batch(range(8), train=True)
    key = jax.random.PRNGKey(3)

    s1, m1 = step_fn(state0, None, jax.device_put(batch), key)

    mesh = make_mesh(8)
    s8, m8 = step_fn(replicate(state0, mesh), None,
                     shard_batch(batch, mesh), key)

    np.testing.assert_allclose(float(m1["loss_total"]), float(m8["loss_total"]),
                               rtol=1e-5)
    assert int(jax.device_get(m1["num_pos"])) == int(jax.device_get(m8["num_pos"]))
    flat1 = jax.tree_util.tree_leaves(jax.device_get(s1.params))
    flat8 = jax.tree_util.tree_leaves(jax.device_get(s8.params))
    for p1, p8 in zip(flat1, flat8):
        # Adam's 1/sqrt(v) amplifies float reduction-order noise for
        # near-zero grads; observed max |diff| ~1e-5 on 0.35% of elements
        np.testing.assert_allclose(p1, p8, rtol=1e-3, atol=3e-5)


def test_per_example_loss_independent_of_device_count():
    """Per-example invariance: each example's positive count is the same
    whether it is evaluated in a batch of 1 or inside the sharded batch of 8
    (the SSC sampler must key its randomness per-example, not per-device)."""
    cfg = _cfg()
    ds = SyntheticPoseDataset(n_fg=N_FG, input_res=RES, max_objs=2,
                              single_class=1, seed=7)
    consts = ds.consts()
    consts = consts._replace(kp3d=consts.kp3d[:N_FG],
                             diameters=consts.diameters[:N_FG])
    from kd6d_pose_adlp_tpu.engine.losses import prepare_targets
    batch = ds.batch(range(8), train=True)
    key = jax.random.PRNGKey(5)
    tgt_full = jax.jit(prepare_targets, static_argnums=(3,))(
        key, jax.device_put(batch), consts, cfg)
    # same batch sharded over the mesh must sample identical positives
    mesh = make_mesh(8)
    tgt_shard = jax.jit(prepare_targets, static_argnums=(3,))(
        key, shard_batch(batch, mesh), consts, cfg)
    np.testing.assert_array_equal(np.asarray(tgt_full.pos_mask),
                                  np.asarray(tgt_shard.pos_mask))


@pytest.mark.slow
def test_dp_sharded_inference_endpoint_matches_unsharded():
    """The serving endpoint (engine/serving.build_infer_fn) under jit with a
    batch sharded over an 8-device Mesh('data') computes the same poses as
    unsharded — DP inference is just input sharding, no code changes."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec

    from kd6d_pose_adlp_tpu.engine.serving import (build_infer_fn,
                                                   centered_bbox_trans)

    cfg = _cfg()
    ds = SyntheticPoseDataset(n_fg=N_FG, input_res=RES, max_objs=2,
                              single_class=1, seed=7)
    consts = ds.consts()
    consts = consts._replace(kp3d=consts.kp3d[:N_FG],
                             diameters=consts.diameters[:N_FG])
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, n_class=N_FG + 1,
                                 mesh_diameters=tuple(
                                     np.asarray(consts.diameters))))
    net = PoseNet(cfg=cfg.model, n_fg=N_FG)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)))
    infer = jax.jit(build_infer_fn(cfg, consts, variables))

    B = 8
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (B, RES, RES, 3), dtype=np.uint8)
    bt = centered_bbox_trans(B, RES)
    ids = np.ones((B,), np.int32)
    seed = jnp.asarray(4, jnp.uint32)

    ref = jax.device_get(infer(jnp.asarray(images), jnp.asarray(bt),
                               jnp.asarray(ids), seed))

    mesh = make_mesh(8)
    shard = lambda x, spec: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, PartitionSpec(*spec)))
    got = jax.device_get(infer(shard(images, ("data",)),
                               shard(bt, ("data",)),
                               shard(ids, ("data",)), seed))
    for k in ("R", "T", "score", "valid"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_gather_eval_pytree_single_process_identity():
    tree = {"a": jnp.arange(6).reshape(3, 2), "b": (jnp.ones(4),)}
    out = gather_eval_pytree(tree)
    assert out is tree  # single-process fast path
    for l1, l2 in zip(jax.tree_util.tree_leaves(out),
                      jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_gather_eval_pytree_multiprocess_shape_contract(monkeypatch):
    """The multi-process branch concatenates per-process leading axes via
    process_allgather; simulate it to pin the shape contract without a real
    multi-host run (reference libs/distributed.py:44-76 equivalent)."""
    import kd6d_pose_adlp_tpu.parallel.mesh as mesh_mod

    class FakeMulti:
        @staticmethod
        def process_allgather(tree):
            # multihost_utils stacks a new leading process axis per leaf
            return jax.tree_util.tree_map(
                lambda x: jnp.stack([x, x], axis=0), tree)

    import jax.experimental as jax_exp
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax_exp, "multihost_utils", FakeMulti, raising=False)
    tree = {"kp": jnp.zeros((3, 8, 2)), "score": jnp.ones((3,))}
    out = mesh_mod.gather_eval_pytree(tree)
    assert out["kp"].shape == (2, 3, 8, 2)
    assert out["score"].shape == (2, 3)
