"""Gradient-semantics regression tests for the building blocks.

The 2x2 max pool MUST use winner-take-all gradient routing (XLA
SelectAndScatter semantics). A reshape+max variant splits the cotangent
equally among tied window elements; in bf16 feature maps 2-5% of windows
are exactly tied and the split gradient cost ~20 ADI-0.1d points on the
10k-step synthetic baseline (bisect outputs/ab/baseline_bisect_{a,b}).
"""
import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.models.blocks import max_pool_2x2


def test_max_pool_values():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = max_pool_2x2(x)
    np.testing.assert_allclose(
        np.asarray(y)[0, :, :, 0], [[5.0, 7.0], [13.0, 15.0]])


def test_max_pool_tie_gradient_routes_to_one_element():
    # all-tied window: the cotangent must reach exactly ONE input element
    # with full magnitude, not be split 4 ways
    x = jnp.ones((1, 2, 2, 1), jnp.float32)
    g = jax.grad(lambda x: max_pool_2x2(x).sum())(x)
    g = np.asarray(g).ravel()
    assert np.isclose(g.sum(), 1.0)
    assert np.isclose(g.max(), 1.0), (
        f"tie gradient split across elements: {g} — winner-take-all "
        f"(SelectAndScatter) semantics required; see module docstring")


def test_max_pool_bf16_tie_gradient():
    x = jnp.ones((1, 2, 2, 1), jnp.bfloat16)
    g = jax.grad(lambda x: max_pool_2x2(x).astype(jnp.float32).sum())(x)
    g = np.asarray(g.astype(jnp.float32)).ravel()
    assert np.isclose(g.max(), 1.0), g


def test_max_pool_fast_matches_windowed():
    from kd6d_pose_adlp_tpu.models.blocks import max_pool_2x2_fast

    rng = np.random.default_rng(0)
    # random values + quantized-to-ties values + a fully tied window
    xs = [rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
          np.round(rng.normal(size=(2, 8, 8, 3)) * 2).astype(np.float32) / 2,
          np.ones((1, 4, 4, 2), np.float32)]
    for x in xs:
        x = jnp.asarray(x)
        np.testing.assert_array_equal(np.asarray(max_pool_2x2_fast(x)),
                                      np.asarray(max_pool_2x2(x)))
        g_ref = jax.grad(lambda x: (max_pool_2x2(x) ** 2).sum())(x)
        g_fast = jax.grad(lambda x: (max_pool_2x2_fast(x) ** 2).sum())(x)
        np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_ref))
