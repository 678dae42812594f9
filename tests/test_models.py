import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.config import ModelConfig
from kd6d_pose_adlp_tpu.models.blocks import count_params
from kd6d_pose_adlp_tpu.models.darknet import DarkNet
from kd6d_pose_adlp_tpu.models.darknet53 import DarkNet53
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet


@pytest.mark.parametrize("version,expected", [
    ("ref", 7_319_416),
    ("tiny", 1_042_104),
    ("19", 20_842_376),
])
def test_darknet_param_parity(version, expected):
    """Exact parameter-count parity with the reference self-test constants
    (reference backbone/darknet.py:284-286)."""
    m = DarkNet(version=version, include_head=True)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    assert count_params(params) == expected


def test_darknet53_param_parity():
    """reference backbone/darknet53.py:242"""
    m = DarkNet53(include_head=True)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    assert count_params(params) == 41_609_928


def test_darknet_pyramid_shapes():
    m = DarkNet(version="tiny-h")
    x = jnp.zeros((2, 256, 256, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [(2, 128, 128, 8), (2, 64, 64, 16), (2, 32, 32, 64), (2, 16, 16, 64)]


def test_darknet53_pyramid_shapes():
    m = DarkNet53()
    x = jnp.zeros((1, 256, 256, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [(1, 128, 128, 64), (1, 64, 64, 128), (1, 32, 32, 256),
                      (1, 16, 16, 512), (1, 8, 8, 1024)]


@pytest.mark.parametrize("backbone,a", [("darknet_tiny_h", 1360), ("darknet53", 1364)])
def test_pose_net_output_shapes(backbone, a):
    cfg = ModelConfig(backbone=backbone)
    net = PoseNet(cfg=cfg, n_fg=15)
    x = jnp.zeros((2, 256, 256, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    cls, reg = net.apply(vars_, x)
    assert cls.shape == (2, a, 15)
    assert reg.shape == (2, a, 240)
    # focal-prior bias: background-dominant initialization => sigmoid ~ 0.01
    p = jax.nn.sigmoid(np.asarray(cls)).mean()
    assert 0.005 < p < 0.02


def test_pose_net_train_mode_updates_batch_stats():
    cfg = ModelConfig(backbone="darknet_tiny_h")
    net = PoseNet(cfg=cfg, n_fg=15)
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    small_cfg = ModelConfig(backbone="darknet_tiny_h", input_res=64)
    net = PoseNet(cfg=small_cfg, n_fg=15)
    vars_ = net.init(jax.random.PRNGKey(0), x)
    (cls, reg), mutated = net.apply(vars_, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_bf16_norms_keep_f32_stats_and_close_to_f32():
    """bfloat16 compute: BN/GN arithmetic runs in bf16 but batch statistics,
    running stats and params stay float32 (flax force_float32_reductions);
    outputs stay within bf16 tolerance of the f32 path."""
    x = np.random.RandomState(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    cfg32 = ModelConfig(backbone="darknet_tiny_h", input_res=64,
                        compute_dtype="float32")
    cfg16 = ModelConfig(backbone="darknet_tiny_h", input_res=64,
                        compute_dtype="bfloat16")
    net32 = PoseNet(cfg=cfg32, n_fg=15)
    net16 = PoseNet(cfg=cfg16, n_fg=15)
    vars_ = net32.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # identical param trees: bf16 config only changes activation dtypes
    (c16, r16), mut = net16.apply(vars_, jnp.asarray(x), train=True,
                                  mutable=["batch_stats"])
    for leaf in jax.tree_util.tree_leaves(mut["batch_stats"]):
        assert leaf.dtype == jnp.float32
    assert c16.dtype == jnp.float32  # network returns f32 outputs
    c32, r32 = net32.apply(vars_, jnp.asarray(x), train=False)
    c16e, _ = net16.apply(vars_, jnp.asarray(x), train=False)
    # bf16 has ~3 decimal digits; logits are O(5)
    assert np.max(np.abs(np.asarray(c16e) - np.asarray(c32))) < 0.25
