"""Fused conv3x3+affine+LeakyReLU Pallas prototype vs the XLA oracle.

Interpret mode on CPU (the TPU A/B lives in scripts/bench_conv_pallas.py).
Shapes mirror darknet_tiny_h's narrow stages (models/darknet.py
DARKNET_CHANNELS['tiny-h']; reference backbone/darknet.py:157-180).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.ops.conv_pallas import (conv3x3_bn_act,
                                                conv3x3_bn_act_ref,
                                                conv3x3_bn_act_stacked,
                                                flat_to_nhwc, nhwc_to_flat,
                                                pack_weights, stack_taps)


@pytest.mark.parametrize("B,H,W,C,O", [
    (2, 16, 16, 3, 8),     # stage-1-like (C=3 stem)
    (2, 12, 20, 8, 16),    # stage-2-like, non-square
    (1, 8, 8, 16, 64),     # stage-3-like
])
def test_matches_xla_oracle(B, H, W, C, O):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k1, (B, H, W, C), jnp.float32)
    k = jax.random.normal(k2, (3, 3, C, O), jnp.float32) * 0.1
    scale = jax.random.normal(k3, (O,)) * 0.5 + 1.0
    bias = jax.random.normal(k4, (O,)) * 0.1
    ref = conv3x3_bn_act_ref(x, k, scale, bias)
    out = conv3x3_bn_act(x, k, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,H,W,C,O", [
    (2, 16, 16, 3, 8),
    (2, 12, 20, 8, 16),
])
def test_stacked_form_matches_xla_oracle(B, H, W, C, O):
    """The pre-stacked tap form (shifts hoisted outside the kernel, bf16
    dots at lane 0 — the Mosaic-rotate-free alternative) is value-exact."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    x = jax.random.normal(k1, (B, H, W, C), jnp.float32)
    k = jax.random.normal(k2, (3, 3, C, O), jnp.float32) * 0.1
    scale = jax.random.normal(k3, (O,)) * 0.5 + 1.0
    bias = jax.random.normal(k4, (O,)) * 0.1
    ref = conv3x3_bn_act_ref(x, k, scale, bias)
    xs = stack_taps(nhwc_to_flat(x), H, W)
    assert xs.shape == (B, 9, C, H * (W + 2))
    y = conv3x3_bn_act_stacked(
        xs, pack_weights(k),
        scale.reshape(-1, 1).astype(jnp.float32),
        bias.reshape(-1, 1).astype(jnp.float32), interpret=True)
    out = flat_to_nhwc(y, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_layout_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 14, 8))
    flat = nhwc_to_flat(x)
    assert flat.shape == (3, 8, 12 * 16 + 2)
    # logical (h, w) of the input sits at padded coords (h+1, w+1)
    grid = np.asarray(flat)[:, :, :12 * 16].reshape(3, 8, 12, 16)
    np.testing.assert_array_equal(grid[:, :, 1:11, 1:15],
                                  np.asarray(x).transpose(0, 3, 1, 2))
    assert np.all(np.asarray(flat)[:, :, -2:] == 0)
    # flat_to_nhwc: output-slab convention, logical w = column w
    y = jax.random.normal(jax.random.PRNGKey(2), (3, 6, 10 * 16))
    back = flat_to_nhwc(y, 10, 14)
    np.testing.assert_array_equal(
        np.asarray(back),
        np.asarray(y).reshape(3, 6, 10, 16)[:, :, :, :14].transpose(0, 2, 3, 1))


def test_pack_weights_order():
    # wmat[dy*3+dx, o, c] == k[dy, dx, c, o]
    k = jnp.arange(3 * 3 * 2 * 4, dtype=jnp.float32).reshape(3, 3, 2, 4)
    w = pack_weights(k)
    assert w.shape == (9, 4, 2)
    assert w[2 * 3 + 0, 1, 1] == k[2, 0, 1, 1]


def test_bf16_path():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8), jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, 8, 16)) * 0.1
         ).astype(jnp.bfloat16)
    one, zero = jnp.ones((16,)), jnp.zeros((16,))
    ref = conv3x3_bn_act_ref(x, k, one, zero)
    out = conv3x3_bn_act(x, k, one, zero, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
