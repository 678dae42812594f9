"""Pallas Sinkhorn kernel vs pure-JAX reference (interpret mode on CPU)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.ops import sinkhorn as sk
from kd6d_pose_adlp_tpu.ops.sinkhorn_pallas import sinkhorn_divergence_pallas


def _clouds(seed, N=5, P=16, T=24, empty_pad=True):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, size=(N, P, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(N, T, 2)).astype(np.float32)
    a = rng.uniform(0.1, 1.0, size=(N, P)).astype(np.float32)
    b = rng.uniform(0.1, 1.0, size=(N, T)).astype(np.float32)
    if empty_pad:
        a[:, P // 2:] = 0.0   # realistic zero-weight padding
        b[:, T - 4:] = 0.0
    return map(jnp.asarray, (x, y, a, b))


def test_pallas_matches_pure_jax_values():
    x, y, a, b = _clouds(0)
    ref = sk.batched_samples_loss(x, y, a, b, gtype="sinkhorn")
    got = sinkhorn_divergence_pallas(x, y, a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_pallas_matches_balanced_and_nondebias():
    x, y, a, b = _clouds(1)
    for reach in (None, 0.5):
        ref = jax.vmap(lambda *t: sk.sinkhorn_divergence(*t, reach=reach))(x, y, a, b)
        got = sinkhorn_divergence_pallas(x, y, a, b, reach=reach, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_pallas_gradients_match():
    x, y, a, b = _clouds(2, N=3)

    def loss_ref(x_, a_):
        return sk.batched_samples_loss(x_, y, a_, b, gtype="sinkhorn").sum()

    def loss_pal(x_, a_):
        return sinkhorn_divergence_pallas(x_, y, a_, b, interpret=True).sum()

    gx_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(x, a)
    gx_p, ga_p = jax.grad(loss_pal, argnums=(0, 1))(x, a)
    # weight gradients agree to float noise
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_r),
                               rtol=1e-4, atol=1e-6)
    assert np.isfinite(np.asarray(ga_p)).all()
    # point gradients: at blur=1e-3 (eps=1e-6) the plan is near-one-hot, so
    # float-noise potential differences shift near-tied assignments; require
    # directional agreement rather than elementwise equality
    r = np.asarray(gx_r).reshape(-1)
    p_ = np.asarray(gx_p).reshape(-1)
    cos = r @ p_ / (np.linalg.norm(r) * np.linalg.norm(p_) + 1e-12)
    assert cos > 0.995, cos
    assert abs(np.linalg.norm(p_) / np.linalg.norm(r) - 1) < 0.05


def test_block_specs_satisfy_mosaic_tiling_rule():
    """Static re-check of the Mosaic `_check_block_mappings` rule that killed
    the round-1 bench (BENCH_r01): each block's last two dims must be
    divisible by (8, 128) or equal to the array's dims. Runs on CPU because
    the real check only fires during TPU lowering."""
    from kd6d_pose_adlp_tpu.ops.sinkhorn_pallas import _GROUP, _build_grid_spec

    def ok(block, array):
        bl2, al2 = block[-2:], array[-2:]
        sub_ok = bl2[0] % 8 == 0 or bl2[0] == al2[0]
        lane_ok = bl2[1] % 128 == 0 or bl2[1] == al2[1]
        return sub_ok and lane_ok

    for (N, P, T) in [(128, 64, 64), (16, 64, 64), (8, 32, 48), (8, 16, 16)]:
        gs = _build_grid_spec(N, P, T)
        arrays = [(N, P, 2), (N, T, 2), (N, P), (N, T),
                  (N, P), (N, T), (N, T), (N, P)]
        specs = list(gs.in_specs) + list(gs.out_specs)
        for spec, arr in zip(specs, arrays):
            assert ok(spec.block_shape, arr), (spec.block_shape, arr)


@pytest.mark.slow
def test_pallas_pad_path_nonmultiple_of_group():
    """N not divisible by the 8-problem group must pad and slice correctly."""
    for N in (1, 7, 9):
        x, y, a, b = _clouds(3, N=N)
        ref = sk.batched_samples_loss(x, y, a, b, gtype="sinkhorn")
        got = sinkhorn_divergence_pallas(x, y, a, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_probe_is_trace_safe():
    """The Pallas-availability probe fires inside the train-step trace; it
    must stay concrete there (round-2 regression: TracerBoolConversionError
    silently disabled Pallas during training)."""
    from kd6d_pose_adlp_tpu.ops.sinkhorn_pallas import _probe_compiles

    results = []

    @jax.jit
    def traced(x):
        results.append(_probe_compiles(interpret=True))
        return x + 1.0

    traced(jnp.zeros(3))
    assert results == [True]
