import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.ops import sinkhorn as sk


def _exact_ot(x, y, a, b, p=2.0):
    """Exact (unregularized, balanced) OT via scipy linprog."""
    from scipy.optimize import linprog
    C = np.asarray(sk.cost_matrix(jnp.asarray(x), jnp.asarray(y), p))
    n, m = C.shape
    A_eq, b_eq = [], []
    for i in range(n):
        row = np.zeros(n * m)
        row[i * m:(i + 1) * m] = 1
        A_eq.append(row)
        b_eq.append(a[i])
    for j in range(m):
        row = np.zeros(n * m)
        row[j::m] = 1
        A_eq.append(row)
        b_eq.append(b[j])
    res = linprog(C.reshape(-1), A_eq=np.array(A_eq), b_eq=np.array(b_eq),
                  bounds=(0, None), method="highs")
    assert res.success
    return res.fun


def _np_ot_eps_scaled(x, y, a, b, blur=1e-3, scaling=0.5, p=2.0, inner=1):
    """Independent NumPy oracle: log-domain Sinkhorn with geomloss-style
    epsilon scaling (Gauss-Seidel, `inner` sweeps per epsilon)."""
    import math
    from scipy.special import logsumexp
    C = np.asarray(sk.cost_matrix(jnp.asarray(x), jnp.asarray(y), p))
    la, lb = np.log(a), np.log(b)
    f = np.zeros(len(x))
    g = np.zeros(len(y))
    for eps in sk.epsilon_schedule(p, 2.0, blur, scaling):
        for _ in range(inner):
            f = -eps * logsumexp(lb[None, :] + (g[None, :] - C) / eps, axis=1)
            g = -eps * logsumexp(la[:, None] + (f[:, None] - C) / eps, axis=0)
    return (a * f).sum() + (b * g).sum()


def test_balanced_sinkhorn_matches_eps_scaled_oracle():
    """At scaling=0.5 the eps-annealed value is an *approximation* of exact OT
    (geomloss behaves identically); check against an independent NumPy oracle
    of the same annealing scheme, and that slower annealing approaches the
    exact LP value from below."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(5, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(7, 2)).astype(np.float32)
    a = np.full(5, 1 / 5, np.float32)
    b = np.full(7, 1 / 7, np.float32)
    ours = float(sk.sinkhorn_divergence(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(a), jnp.asarray(b),
        p=2.0, blur=1e-3, scaling=0.5, reach=None))
    oracle = _np_ot_eps_scaled(x, y, a, b, blur=1e-3, scaling=0.5)
    np.testing.assert_allclose(ours, oracle, rtol=0.03)

    exact = _exact_ot(x, y, a, b)
    converged = _np_ot_eps_scaled(x, y, a, b, blur=1e-3, scaling=0.5, inner=50)
    np.testing.assert_allclose(converged, exact, rtol=0.005)
    assert ours <= exact * 1.01  # annealed value approaches OT from below


def test_self_divergence_is_zero():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(6, 2)).astype(np.float32)
    a = rng.uniform(0.5, 1.5, size=(6,)).astype(np.float32)
    for reach in (None, 0.5):
        v = float(sk.sinkhorn_divergence(jnp.asarray(x), jnp.asarray(x),
                                         jnp.asarray(a), jnp.asarray(a),
                                         blur=1e-3, reach=reach))
        assert abs(v) < 1e-4, (reach, v)


def test_zero_weight_padding_is_exact():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, size=(5, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(4, 2)).astype(np.float32)
    a = rng.uniform(0.1, 1.0, size=(5,)).astype(np.float32)
    b = rng.uniform(0.1, 1.0, size=(4,)).astype(np.float32)
    base = float(sk.sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y),
                                        jnp.asarray(a), jnp.asarray(b)))
    # pad both clouds with zero-weight garbage points
    xp = np.concatenate([x, rng.uniform(5, 6, size=(3, 2)).astype(np.float32)])
    yp = np.concatenate([y, rng.uniform(-4, -3, size=(6, 2)).astype(np.float32)])
    ap = np.concatenate([a, np.zeros(3, np.float32)])
    bp = np.concatenate([b, np.zeros(6, np.float32)])
    padded = float(sk.sinkhorn_divergence(jnp.asarray(xp), jnp.asarray(yp),
                                          jnp.asarray(ap), jnp.asarray(bp)))
    np.testing.assert_allclose(padded, base, rtol=1e-4, atol=1e-6)


def test_unbalanced_approaches_balanced_for_large_reach():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, size=(5, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(5, 2)).astype(np.float32)
    a = np.full(5, 0.2, np.float32)
    b = np.full(5, 0.2, np.float32)
    bal = float(sk.sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y),
                                       jnp.asarray(a), jnp.asarray(b), reach=None))
    # reach=10 (rho=100) is already deep in the balanced regime; much larger
    # reach values hit f32 cancellation in (rho+eps/2)*(e^(-a/rho)-e^(-b/rho))
    unb = float(sk.sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y),
                                       jnp.asarray(a), jnp.asarray(b), reach=10.0))
    np.testing.assert_allclose(unb, bal, rtol=0.02, atol=1e-4)


def test_gradients_pull_clouds_together():
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 0.3, size=(6, 2)).astype(np.float32)
    y = x + np.array([0.4, 0.0], np.float32)  # shifted copy
    a = np.full(6, 1 / 6, np.float32)

    def loss(xx):
        return sk.sinkhorn_divergence(xx, jnp.asarray(y), jnp.asarray(a),
                                      jnp.asarray(a), reach=0.5)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    assert np.isfinite(g).all()
    # moving x along -grad should reduce the divergence => grad_x points away from y
    assert (g[:, 0] < 0).all()  # y is at +x direction; derivative must be negative


def test_weight_gradients_exist():
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, size=(4, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(5, 2)).astype(np.float32)
    b = np.full(5, 0.2, np.float32)

    def loss(aw):
        return sk.sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y), aw,
                                      jnp.asarray(b), reach=0.5)

    g = np.asarray(jax.grad(loss)(jnp.full(4, 0.25)))
    assert np.isfinite(g).all() and (np.abs(g) > 0).any()


def test_batched_and_jit():
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, size=(3, 8, 6, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(3, 8, 9, 2)).astype(np.float32)
    a = rng.uniform(0.0, 1.0, size=(3, 8, 6)).astype(np.float32)
    b = rng.uniform(0.0, 1.0, size=(3, 8, 9)).astype(np.float32)
    fn = jax.jit(lambda *t: sk.batched_samples_loss(*t, gtype="sinkhorn"))
    out = np.asarray(fn(jnp.asarray(x), jnp.asarray(y), jnp.asarray(a), jnp.asarray(b)))
    assert out.shape == (3, 8)
    assert np.isfinite(out).all()


@pytest.mark.parametrize("gtype", ["energy", "gaussian", "laplacian"])
def test_kernel_losses_positive_and_zero_on_self(gtype):
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, size=(6, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(6, 2)).astype(np.float32)
    a = np.full(6, 1 / 6, np.float32)
    v_self = float(sk.kernel_loss(jnp.asarray(x), jnp.asarray(x), jnp.asarray(a),
                                  jnp.asarray(a), gtype=gtype, blur=0.5))
    v_cross = float(sk.kernel_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(a),
                                   jnp.asarray(a), gtype=gtype, blur=0.5))
    assert abs(v_self) < 1e-6
    assert v_cross > 0
