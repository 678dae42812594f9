"""Pure-jnp fixed-size linalg (ops/smallalg.py) vs numpy.linalg oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kd6d_pose_adlp_tpu.ops import smallalg as sa


def rand_spd(rs, n, cond=100.0):
    Q = np.linalg.qr(rs.randn(n, n))[0]
    w = np.geomspace(1.0, cond, n)
    return (Q * w) @ Q.T


def test_inv3_inv4():
    rs = np.random.RandomState(0)
    for n, f in [(3, sa.inv3), (4, sa.inv4)]:
        for _ in range(20):
            A = rs.randn(n, n).astype(np.float32)
            if abs(np.linalg.det(A)) < 1e-3:
                continue
            got = np.asarray(f(jnp.asarray(A)))
            np.testing.assert_allclose(got, np.linalg.inv(A),
                                       rtol=2e-3, atol=2e-4)


def test_cholesky_solve_fixed():
    rs = np.random.RandomState(1)
    for n in (4, 12):
        A = rand_spd(rs, n).astype(np.float32)
        B = rs.randn(n, 3).astype(np.float32)
        X = np.asarray(sa.solve_spd(jnp.asarray(A), jnp.asarray(B), n))
        np.testing.assert_allclose(A @ X, B, rtol=1e-3, atol=1e-3)
        b = rs.randn(n).astype(np.float32)
        x = np.asarray(sa.solve_spd(jnp.asarray(A), jnp.asarray(b), n))
        np.testing.assert_allclose(A @ x, b, rtol=1e-3, atol=1e-3)


def test_eigh3_matches_numpy():
    rs = np.random.RandomState(2)
    for _ in range(30):
        A = rs.randn(3, 3)
        S = ((A + A.T) / 2).astype(np.float32)
        w, V = sa.eigh3(jnp.asarray(S))
        w, V = np.asarray(w), np.asarray(V)
        wr = np.linalg.eigvalsh(S)
        np.testing.assert_allclose(w, wr, rtol=1e-4, atol=1e-4 * np.abs(wr).max())
        # eigen-equation + orthonormality
        np.testing.assert_allclose(S @ V, V * w[None, :], atol=5e-4 * np.abs(wr).max())
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-5)


def test_eigh3_degenerate_spherical():
    # repeated eigenvalues: any orthonormal basis is correct
    for S in [np.eye(3, dtype=np.float32) * 2.5,
              np.diag([1.0, 1.0, 3.0]).astype(np.float32)]:
        w, V = sa.eigh3(jnp.asarray(S))
        V = np.asarray(V)
        np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(S), atol=1e-5)
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(S @ V, V * np.asarray(w)[None, :], atol=1e-4)


def test_eigh4_jacobi():
    rs = np.random.RandomState(3)
    for _ in range(20):
        A = rs.randn(4, 4)
        S = ((A + A.T) / 2).astype(np.float32)
        w, V = sa.eigh4(jnp.asarray(S))
        w, V = np.asarray(w), np.asarray(V)
        np.testing.assert_allclose(w, np.linalg.eigvalsh(S), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(S @ V, V * w[None, :], atol=1e-4)
        np.testing.assert_allclose(V.T @ V, np.eye(4), atol=1e-5)


def test_smallest_eigvecs_subspace():
    rs = np.random.RandomState(4)
    for gap in (10.0, 100.0):
        # PSD 12x12 with a clear 4-dim small-eigenvalue subspace (EPnP regime:
        # near-null kernel vs O(1) row space)
        Q = np.linalg.qr(rs.randn(12, 12))[0]
        w = np.concatenate([np.geomspace(1e-6, 1e-4, 4),
                            np.geomspace(1e-4 * gap, 1.0, 8)])
        A = ((Q * w) @ Q.T).astype(np.float32)
        wg, V = sa.smallest_eigvecs(jnp.asarray(A), k=4)
        V = np.asarray(V)
        # subspace match: projection of V onto the true small subspace ~ I
        P = Q[:, :4]
        s = np.linalg.svd(P.T @ V, compute_uv=False)
        assert s.min() > 0.999, s
        np.testing.assert_allclose(V.T @ V, np.eye(4), atol=1e-4)
        # ascending Ritz values
        wg = np.asarray(wg)
        assert np.all(np.diff(wg) >= -1e-8)


def test_rotation_horn_vs_kabsch():
    rs = np.random.RandomState(5)
    for _ in range(20):
        # random rotation via QR with det fix
        Q = np.linalg.qr(rs.randn(3, 3))[0]
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        X = rs.randn(40, 3)
        w = rs.uniform(0.1, 1.0, 40)
        noise = 0.01 * rs.randn(40, 3)
        Y = X @ Q.T + noise
        Xc = X - (w[:, None] * X).sum(0) / w.sum()
        Yc = Y - (w[:, None] * Y).sum(0) / w.sum()
        R = np.asarray(sa.rotation_horn(jnp.asarray(Xc, dtype=jnp.float32),
                                        jnp.asarray(Yc, dtype=jnp.float32),
                                        jnp.asarray(w, dtype=jnp.float32)))
        # numpy Kabsch oracle
        S = (w[:, None] * Yc).T @ Xc
        U, _, Vt = np.linalg.svd(S)
        D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        Rref = U @ D @ Vt
        assert np.linalg.det(R) > 0.99
        np.testing.assert_allclose(R, Rref, atol=5e-4)


def test_rotation_horn_reflection_case():
    # noise pattern that would tempt an SVD solution into a reflection:
    # Horn's quaternion is proper by construction
    rs = np.random.RandomState(6)
    X = rs.randn(4, 3)
    Y = -X  # a pure point inversion: best proper rotation is a 180deg turn
    R = np.asarray(sa.rotation_horn(
        jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
        jnp.ones((4,), jnp.float32)))
    assert np.linalg.det(R) > 0.99
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)


@pytest.mark.slow
def test_vmap_jit_compatibility():
    rs = np.random.RandomState(7)
    As = np.stack([rand_spd(rs, 12) for _ in range(8)]).astype(np.float32)
    f = jax.jit(jax.vmap(lambda A: sa.smallest_eigvecs(A, k=4)[1]))
    V = np.asarray(f(jnp.asarray(As)))
    assert V.shape == (8, 12, 4)
    for i in range(8):
        np.testing.assert_allclose(V[i].T @ V[i], np.eye(4), atol=1e-4)


def test_smallest_eigvecs_small_gap():
    """gap ~1.5 regime (noisy overdetermined sets): the subspace mixes with
    the row space, but the DOMINANT 3 directions must stay accurate and the
    4-dim Ritz basis must still capture most of the true small subspace —
    the error budget the downstream Gauss-Newton + LHM polish absorbs
    (see smallest_eigvecs docstring CONTRACT)."""
    rs = np.random.RandomState(11)
    for trial in range(5):
        Q = np.linalg.qr(rs.randn(12, 12))[0]
        # small subspace at ~1e-4, row space starting only 1.5x above it
        w = np.concatenate([np.geomspace(1e-6, 1e-4, 4),
                            np.geomspace(1.5e-4, 1.0, 8)])
        A = ((Q * w) @ Q.T).astype(np.float32)
        wg, V = sa.smallest_eigvecs(jnp.asarray(A), k=4)
        V = np.asarray(V)
        np.testing.assert_allclose(V.T @ V, np.eye(4), atol=1e-4)
        P = Q[:, :4]
        s = np.linalg.svd(P.T @ V, compute_uv=False)
        # the three clearly-separated directions are found essentially
        # exactly; the 4th (sitting 1.5x below the row space) may mix
        assert s[2] > 0.99, s
        assert s[3] > 0.5, s


def test_rotation_horn_orthogonal_init_case():
    """Optimal quaternion EXACTLY orthogonal to the primary power-iteration
    init: the second (orthogonal) init chain must recover it (ADVICE r2)."""
    q0 = np.array([1.0, 0.0103, 0.0211, 0.0317])
    q0 /= np.linalg.norm(q0)
    # target: a 180-degree-style quaternion orthogonalized against q0
    qt = np.array([0.0, 1.0, 0.0, 0.0])
    qt = qt - (qt @ q0) * q0
    qt /= np.linalg.norm(qt)
    Rt = np.asarray(sa.quat_to_rot(jnp.asarray(qt, jnp.float32)))
    rs = np.random.RandomState(8)
    X = rs.randn(30, 3).astype(np.float32)
    X -= X.mean(0)
    Y = X @ Rt.T
    R = np.asarray(sa.rotation_horn(jnp.asarray(X), jnp.asarray(Y),
                                    jnp.ones((30,), jnp.float32)))
    np.testing.assert_allclose(R, Rt, atol=1e-3)


def test_smallest_eigvecs_two_jit_traces_no_tracer_leak():
    """_subspace_init is lru_cached: if it ever returns a jnp value created
    during a trace, the cached tracer leaks into the SECOND compiled program
    (UnexpectedTracerError crashed the eval of every second run in a process,
    2026-08-17). The cache must hold host NumPy only."""
    sa._subspace_init.cache_clear()
    rs = np.random.RandomState(3)
    M = rs.randn(20, 12).astype(np.float32)
    A = jnp.asarray(M.T @ M)
    f1 = jax.jit(lambda a: sa.smallest_eigvecs(a)[0])
    f2 = jax.jit(lambda a: sa.smallest_eigvecs(a)[1])  # distinct trace
    w = np.asarray(f1(A))
    V = np.asarray(f2(A))  # raised UnexpectedTracerError before the fix
    assert w.shape == (4,) and V.shape == (12, 4)
    assert np.all(np.isfinite(V))
    assert isinstance(sa._subspace_init(12, 4), np.ndarray)
