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


# ---------------------------------------------------------------------------
# Unbalanced (reach=0.5) oracles — VERDICT round-1 item 5. The headline KD
# config (reference arguments/argument_kd.py:41-49, losses/loss_libs.py:39-49)
# is sinkhorn p=2 blur=0.001 scaling=0.5 reach=0.5; round 1 verified this
# regime only via self-divergence and the large-reach limit.
# ---------------------------------------------------------------------------

def _np_unbalanced_damped(x, y, a, b, *, blur=1e-3, scaling=0.5, p=2.0,
                          reach=0.5, debias=True, diameter=2.0):
    """Independent float64 NumPy oracle of the geomloss unbalanced iteration:
    eps-annealing, damping lam = 1/(1+eps/rho), symmetric Jacobi updates with
    0.5 averaging, value = (rho+eps/2)(<a, e^(-f_xx/rho)-e^(-f_xy/rho)> + sym)
    (debiased) or (rho+eps/2)(<a,1-e^(-f_xy/rho)> + sym) (plain)."""
    from scipy.special import logsumexp
    rho = float(reach) ** p

    def cost(u, v):
        d2 = ((u[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        return d2 / p if p == 2 else np.sqrt(np.maximum(d2, 1e-300))

    def softmin(eps, C, h):
        return -eps * logsumexp(h[None, :] - C / eps, axis=1)

    la, lb = np.log(a + 1e-300), np.log(b + 1e-300)
    C_xy = cost(x, y)
    C_yx = C_xy.T
    C_xx, C_yy = cost(x, x), cost(y, y)
    eps_list = sk.epsilon_schedule(p, diameter, blur, scaling)

    eps0 = eps_list[0]
    lam = 1.0 / (1.0 + eps0 / rho)
    b_x = lam * softmin(eps0, C_xy, lb)
    a_y = lam * softmin(eps0, C_yx, la)
    a_x = lam * softmin(eps0, C_xx, la)
    b_y = lam * softmin(eps0, C_yy, lb)
    for eps in eps_list[1:]:
        lam = 1.0 / (1.0 + eps / rho)
        b_x, a_y, a_x, b_y = (
            0.5 * (b_x + lam * softmin(eps, C_xy, lb + a_y / eps)),
            0.5 * (a_y + lam * softmin(eps, C_yx, la + b_x / eps)),
            0.5 * (a_x + lam * softmin(eps, C_xx, la + a_x / eps)),
            0.5 * (b_y + lam * softmin(eps, C_yy, lb + b_y / eps)),
        )
    eps = eps_list[-1]
    w = rho + eps / 2.0
    if debias:
        return w * ((a * (np.exp(-a_x / rho) - np.exp(-b_x / rho))).sum()
                    + (b * (np.exp(-b_y / rho) - np.exp(-a_y / rho))).sum())
    return w * ((a * (1.0 - np.exp(-b_x / rho))).sum()
                + (b * (1.0 - np.exp(-a_y / rho))).sum())


def test_unbalanced_headline_config_matches_numpy_oracle():
    """JAX and Pallas(interpret) paths vs the independent float64 oracle at
    the exact headline config (reach=0.5, blur=0.001, scaling=0.5), with
    unequal total masses and zero-weight padding."""
    from kd6d_pose_adlp_tpu.ops.sinkhorn_pallas import sinkhorn_divergence_pallas
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, size=(8, 2)).astype(np.float32)
    y = rng.uniform(0, 1, size=(10, 2)).astype(np.float32)
    a = rng.uniform(0.05, 1.0, size=(8,)).astype(np.float32)
    b = rng.uniform(0.05, 2.0, size=(10,)).astype(np.float32)
    a[6:] = 0.0  # padding
    for debias in (True, False):
        oracle = _np_unbalanced_damped(
            x.astype(np.float64), y.astype(np.float64),
            a.astype(np.float64), b.astype(np.float64), debias=debias)
        ours = float(sk.sinkhorn_divergence(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(a), jnp.asarray(b),
            p=2.0, blur=1e-3, scaling=0.5, reach=0.5, debias=debias))
        np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=1e-5)
        pal = float(sinkhorn_divergence_pallas(
            x[None], y[None], a[None], b[None],
            p=2.0, blur=1e-3, scaling=0.5, reach=0.5, debias=debias,
            interpret=True)[0])
        np.testing.assert_allclose(pal, oracle, rtol=2e-3, atol=1e-5)


def test_unbalanced_value_formula_identity_at_convergence():
    """First-principles grounding of the (rho+eps/2) value formula: at a
    CONVERGED fixed eps, (1) the primal unbalanced-entropic objective equals
    the dual value (strong duality, gap == 0), and (2) the geomloss estimator
    (rho+eps/2)(<a, e^(-f_xx/rho)-e^(-f_xy/rho)> + sym) equals the definition
    S = OT(a,b) - OT(a,a)/2 - OT(b,b)/2 + eps/2 (m(a)-m(b))^2 exactly
    (Sejourne et al. unbalanced Sinkhorn divergence)."""
    from scipy.special import logsumexp
    rng = np.random.default_rng(7)
    n, m = 6, 9
    x = rng.uniform(0, 1, (n, 2))
    y = rng.uniform(0, 1, (m, 2))
    a = rng.uniform(0.2, 1.0, n)
    b = rng.uniform(0.2, 1.0, m)
    eps, rho = 0.01, 0.25
    lam = 1.0 / (1.0 + eps / rho)
    cost = lambda u, v: ((u[:, None, :] - v[None, :, :]) ** 2).sum(-1) / 2.0

    def converge_pair(Cxy, la, lb, iters=5000):
        f, g = np.zeros(len(la)), np.zeros(len(lb))
        for _ in range(iters):
            f = -lam * eps * logsumexp(lb[None, :] + (g[None, :] - Cxy) / eps, axis=1)
            g = -lam * eps * logsumexp(la[:, None] + (f[:, None] - Cxy) / eps, axis=0)
        return f, g

    def converge_sym(Cxx, la, iters=5000):
        f = np.zeros(len(la))
        for _ in range(iters):
            ft = -lam * eps * logsumexp(la[None, :] + (f[None, :] - Cxx) / eps, axis=1)
            f = 0.5 * (f + ft)
        return f

    def ot_dual(Cxy, la, lb, f, g, aa, bb):
        mpi = np.exp(la[:, None] + lb[None, :]
                     + (f[:, None] + g[None, :] - Cxy) / eps).sum()
        return (rho * (aa * (1 - np.exp(-f / rho))).sum()
                + rho * (bb * (1 - np.exp(-g / rho))).sum()
                - eps * (mpi - aa.sum() * bb.sum()))

    def primal(Cxy, la, lb, f, g, aa, bb):
        pi = np.exp(la[:, None] + lb[None, :]
                    + (f[:, None] + g[None, :] - Cxy) / eps)
        def kl(u, v):
            r = np.where(u > 0, u * np.log(np.maximum(u, 1e-300) / v), 0.0)
            return (r - u + v).sum()
        return ((pi * Cxy).sum() + eps * kl(pi, aa[:, None] * bb[None, :])
                + rho * kl(pi.sum(1), aa) + rho * kl(pi.sum(0), bb))

    la, lb = np.log(a), np.log(b)
    C_xy, C_xx, C_yy = cost(x, y), cost(x, x), cost(y, y)
    f_xy, g_xy = converge_pair(C_xy, la, lb)
    f_xx = converge_sym(C_xx, la)
    g_yy = converge_sym(C_yy, lb)

    P = primal(C_xy, la, lb, f_xy, g_xy, a, b)
    D = ot_dual(C_xy, la, lb, f_xy, g_xy, a, b)
    np.testing.assert_allclose(P, D, rtol=1e-10)

    S_def = (D - 0.5 * ot_dual(C_xx, la, la, f_xx, f_xx, a, a)
             - 0.5 * ot_dual(C_yy, lb, lb, g_yy, g_yy, b, b)
             + eps / 2 * (a.sum() - b.sum()) ** 2)
    S_formula = (rho + eps / 2) * (
        (a * (np.exp(-f_xx / rho) - np.exp(-f_xy / rho))).sum()
        + (b * (np.exp(-g_yy / rho) - np.exp(-g_xy / rho))).sum())
    np.testing.assert_allclose(S_formula, S_def, rtol=1e-10)
