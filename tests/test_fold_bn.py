"""BN-folding and backbone-init correctness.

Teacher-side BN folding (utils/fold_bn) must be numerically equivalent to
the eval-mode BatchNorm it replaces (reference models/model_kd.py:62-75
keeps the teacher in eval mode, where BN is a constant affine). Backbone
init (utils/checkpoint.load_backbone_init) is the TPU equivalent of the
reference's pretrained-backbone load (libs/train_libs.py:82-87).
"""
import pytest
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.config import ModelConfig
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm


def _trained_variables(cfg, n_fg=15, steps=2):
    """Init + a couple of train-mode applies so batch_stats are non-trivial."""
    net = PoseNet(cfg=cfg, n_fg=n_fg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 64, 3)) * 0.5
    variables = net.init(rng, x)
    for i in range(steps):
        xi = jax.random.normal(jax.random.PRNGKey(i + 1), (2, 64, 64, 3))
        _, mut = net.apply(variables, xi, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
    return net, variables


def test_fold_batchnorm_matches_eval_forward():
    cfg = ModelConfig(backbone="darknet_tiny_h", input_res=64)
    net, variables = _trained_variables(cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3))
    cls_ref, reg_ref = net.apply(variables, x, train=False)

    folded_vars = fold_batchnorm(variables)
    folded_net = PoseNet(cfg=dataclasses.replace(cfg, bn_folded=True), n_fg=15)
    cls_f, reg_f = folded_net.apply(folded_vars, x, train=False)

    np.testing.assert_allclose(np.asarray(cls_f), np.asarray(cls_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_f), np.asarray(reg_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fold_batchnorm_param_structure_matches_folded_model():
    """Folded params must restore 1:1 into a bn_folded=True model init."""
    cfg = ModelConfig(backbone="darknet53", input_res=128)
    net = PoseNet(cfg=cfg, n_fg=15)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 128, 128, 3))
    variables = net.init(rng, x)
    _, mut = net.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    folded_vars = fold_batchnorm(variables)

    folded_net = PoseNet(cfg=dataclasses.replace(cfg, bn_folded=True), n_fg=15)
    template = folded_net.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    from flax import traverse_util
    from flax.serialization import to_state_dict
    keys_t = set(traverse_util.flatten_dict(to_state_dict(template["params"])))
    keys_f = set(traverse_util.flatten_dict(to_state_dict(folded_vars["params"])))
    assert keys_t == keys_f


def test_load_backbone_init_restores_backbone_only(tmp_path):
    from kd6d_pose_adlp_tpu.utils.checkpoint import (load_backbone_init,
                                                     save_params)
    cfg = ModelConfig(backbone="darknet_tiny_h", input_res=64)
    net, source = _trained_variables(cfg, steps=1)
    path = os.path.join(tmp_path, "final.ckpt")
    save_params(path, source)

    fresh = net.init(jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3)))
    params, stats, n = load_backbone_init(
        path, fresh["params"], fresh.get("batch_stats", {}))
    assert n > 0

    src_bb = jax.tree_util.tree_leaves(source["params"]["backbone"])
    new_bb = jax.tree_util.tree_leaves(params["backbone"])
    for a, b in zip(src_bb, new_bb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # BN statistics come along too
    src_st = jax.tree_util.tree_leaves(source["batch_stats"]["backbone"])
    new_st = jax.tree_util.tree_leaves(stats["backbone"])
    for a, b in zip(src_st, new_st):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # head/fpn keep the fresh init (different PRNG key => different values)
    fresh_head = jax.tree_util.tree_leaves(fresh["params"]["head"])
    new_head = jax.tree_util.tree_leaves(params["head"])
    for a, b in zip(fresh_head, new_head):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
