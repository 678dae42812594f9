"""Fixed-size linear algebra in pure jnp (no lax.linalg CustomCalls).

TPU-native replacements for the small eigh/svd/solve factorizations inside
the EPnP / RANSAC / LHM solvers (`ops/epnp.py`). XLA lowers
`jnp.linalg.{svd,eigh,solve,lstsq}` to iterative CustomCall algorithms
(QDWH/Jacobi/blocked LU) whose fixed latency dwarfs the surrounding
arithmetic for 3x3/4x4/12x12 problems — and they cannot fuse with
neighbouring ops. Everything here is straight-line elementwise/matmul code:
it vmaps over the (batch x hypotheses) axes of the RANSAC solver and fuses
into the enclosing XLA program. This replaces the reference's CPU hop to
cv2.solvePnPRansac (`/root/reference/postprocess/postprocess.py:190`) with
device code that is actually fast on a TPU, not just resident on one.

All functions take a single (unbatched) problem and are vmap-safe; float32
with HIGHEST-precision matmuls throughout.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_hp = jax.lax.Precision.HIGHEST
_mm = functools.partial(jnp.matmul, precision=_hp)


# ---------------------------------------------------------------------------
# inverses / solves
# ---------------------------------------------------------------------------

def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Adjugate-based inverse of a 3x3 matrix."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    adj = jnp.stack([jnp.stack([A00, A01, A02]),
                     jnp.stack([A10, A11, A12]),
                     jnp.stack([A20, A21, A22])])
    return adj / det


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for 3x3 A; b (3,) or (3, k)."""
    Ai = inv3(A)
    if b.ndim == 2:
        return _mm(Ai, b)
    return _mm(Ai, b[:, None])[:, 0]


def inv4(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a 4x4 matrix via the cofactor (adjugate) expansion."""
    # 2x2 minors of the last two rows
    m = A
    s0 = m[0, 0] * m[1, 1] - m[1, 0] * m[0, 1]
    s1 = m[0, 0] * m[1, 2] - m[1, 0] * m[0, 2]
    s2 = m[0, 0] * m[1, 3] - m[1, 0] * m[0, 3]
    s3 = m[0, 1] * m[1, 2] - m[1, 1] * m[0, 2]
    s4 = m[0, 1] * m[1, 3] - m[1, 1] * m[0, 3]
    s5 = m[0, 2] * m[1, 3] - m[1, 2] * m[0, 3]
    c5 = m[2, 2] * m[3, 3] - m[3, 2] * m[2, 3]
    c4 = m[2, 1] * m[3, 3] - m[3, 1] * m[2, 3]
    c3 = m[2, 1] * m[3, 2] - m[3, 1] * m[2, 2]
    c2 = m[2, 0] * m[3, 3] - m[3, 0] * m[2, 3]
    c1 = m[2, 0] * m[3, 2] - m[3, 0] * m[2, 2]
    c0 = m[2, 0] * m[3, 1] - m[3, 0] * m[2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv = jnp.stack([
        jnp.stack([m[1, 1] * c5 - m[1, 2] * c4 + m[1, 3] * c3,
                   -m[0, 1] * c5 + m[0, 2] * c4 - m[0, 3] * c3,
                   m[3, 1] * s5 - m[3, 2] * s4 + m[3, 3] * s3,
                   -m[2, 1] * s5 + m[2, 2] * s4 - m[2, 3] * s3]),
        jnp.stack([-m[1, 0] * c5 + m[1, 2] * c2 - m[1, 3] * c1,
                   m[0, 0] * c5 - m[0, 2] * c2 + m[0, 3] * c1,
                   -m[3, 0] * s5 + m[3, 2] * s2 - m[3, 3] * s1,
                   m[2, 0] * s5 - m[2, 2] * s2 + m[2, 3] * s1]),
        jnp.stack([m[1, 0] * c4 - m[1, 1] * c2 + m[1, 3] * c0,
                   -m[0, 0] * c4 + m[0, 1] * c2 - m[0, 3] * c0,
                   m[3, 0] * s4 - m[3, 1] * s2 + m[3, 3] * s0,
                   -m[2, 0] * s4 + m[2, 1] * s2 - m[2, 3] * s0]),
        jnp.stack([-m[1, 0] * c3 + m[1, 1] * c1 - m[1, 2] * c0,
                   m[0, 0] * c3 - m[0, 1] * c1 + m[0, 2] * c0,
                   -m[3, 0] * s3 + m[3, 1] * s1 - m[3, 2] * s0,
                   m[2, 0] * s3 - m[2, 1] * s1 + m[2, 2] * s0]),
    ])
    return inv / det


def cholesky_fixed(A: jnp.ndarray, n: int) -> jnp.ndarray:
    """Unrolled Cholesky A = L L^T for SPD A of static size n (row ops only,
    n sequential steps — each vectorized, so the chain is short for n<=12)."""
    L = jnp.zeros_like(A)
    for j in range(n):
        # L[j, j] and column j below the diagonal
        s = A[j, j] - (L[j, :j] ** 2).sum() if j else A[j, j]
        d = jnp.sqrt(jnp.maximum(s, 1e-20))
        L = L.at[j, j].set(d)
        if j + 1 < n:
            if j:
                off = A[j + 1:, j] - _mm(L[j + 1:, :j], L[j, :j][:, None])[:, 0]
            else:
                off = A[j + 1:, j]
            L = L.at[j + 1:, j].set(off / d)
    return L


def chol_solve_fixed(L: jnp.ndarray, B: jnp.ndarray, n: int) -> jnp.ndarray:
    """Solve (L L^T) X = B with unrolled forward/back substitution.
    B (n,) or (n, k)."""
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    Y = jnp.zeros_like(B)
    for i in range(n):
        r = B[i] - (_mm(L[i:i + 1, :i], Y[:i])[0] if i else 0.0)
        Y = Y.at[i].set(r / L[i, i])
    X = jnp.zeros_like(B)
    for i in range(n - 1, -1, -1):
        r = Y[i] - (_mm(L[i + 1:, i][None, :], X[i + 1:])[0]
                    if i + 1 < n else 0.0)
        X = X.at[i].set(r / L[i, i])
    return X[:, 0] if vec else X


def solve_spd(A: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """SPD solve via the unrolled Cholesky."""
    return chol_solve_fixed(cholesky_fixed(A, n), b, n)


# ---------------------------------------------------------------------------
# symmetric 3x3 eigendecomposition (analytic, Eberly-style)
# ---------------------------------------------------------------------------

def _largest_eigvec3(S: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of symmetric 3x3 S for eigenvalue lam via the largest
    cross product of rows of (S - lam I); falls back to e_z when degenerate
    (then any vector in the eigenspace is valid)."""
    M = S - lam * jnp.eye(3, dtype=S.dtype)
    c01 = jnp.cross(M[0], M[1])
    c02 = jnp.cross(M[0], M[2])
    c12 = jnp.cross(M[1], M[2])
    cands = jnp.stack([c01, c02, c12])
    n2 = (cands * cands).sum(-1)
    v = cands[jnp.argmax(n2)]
    ok = jnp.max(n2) > 1e-24
    v = jnp.where(ok, v, jnp.asarray([0.0, 0.0, 1.0], S.dtype))
    return v / jnp.sqrt(jnp.maximum((v * v).sum(), 1e-30))


def eigh3(S: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic symmetric 3x3 eigendecomposition, ascending eigenvalues.

    Returns (w (3,), V (3,3) columns) like jnp.linalg.eigh. Degenerate
    (repeated-eigenvalue) inputs return *an* orthonormal eigenbasis, which is
    all EPnP's control-point construction needs.
    """
    scale = jnp.maximum(jnp.abs(S).max(), 1e-20)
    B = S / scale
    q = jnp.trace(B) / 3.0
    Bq = B - q * jnp.eye(3, dtype=S.dtype)
    p2 = (Bq * Bq).sum() / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    # det of 3x3
    C = Bq / p
    detC = (C[0, 0] * (C[1, 1] * C[2, 2] - C[1, 2] * C[2, 1])
            - C[0, 1] * (C[1, 0] * C[2, 2] - C[1, 2] * C[2, 0])
            + C[0, 2] * (C[1, 0] * C[2, 1] - C[1, 1] * C[2, 0]))
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)                     # largest
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w0 - w2
    # handle the (near-)spherical case p2 ~ 0: all eigenvalues = q
    spherical = p2 < 1e-18
    w0 = jnp.where(spherical, q, w0)
    w1 = jnp.where(spherical, q, w1)
    w2 = jnp.where(spherical, q, w2)

    v2 = _largest_eigvec3(B, w2)
    v0 = _largest_eigvec3(B, w0)
    # exact orthonormality: re-orthogonalize v0 against v2, complete with cross
    v0 = v0 - (v0 @ v2) * v2
    n0 = jnp.sqrt((v0 * v0).sum())
    # fallback when v0 collapsed onto v2 (degenerate spectrum)
    alt = jnp.cross(v2, jnp.asarray([1.0, 0.0, 0.0], S.dtype))
    alt2 = jnp.cross(v2, jnp.asarray([0.0, 1.0, 0.0], S.dtype))
    alt = jnp.where((alt * alt).sum() > 0.1, alt, alt2)
    v0 = jnp.where(n0 > 1e-6, v0 / jnp.maximum(n0, 1e-30),
                   alt / jnp.sqrt(jnp.maximum((alt * alt).sum(), 1e-30)))
    v1 = jnp.cross(v2, v0)
    w = jnp.stack([w0, w1, w2]) * scale
    V = jnp.stack([v0, v1, v2], axis=1)
    return w, V


# ---------------------------------------------------------------------------
# symmetric 4x4 eigendecomposition (cyclic Jacobi, unrolled)
# ---------------------------------------------------------------------------

_J4_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def eigh4(S: jnp.ndarray, sweeps: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric 4x4 eigendecomposition via unrolled cyclic Jacobi sweeps,
    ascending eigenvalues. 8 sweeps reach float32 machine precision."""
    A = S
    V = jnp.eye(4, dtype=S.dtype)
    for _ in range(sweeps):
        for (p, q) in _J4_PAIRS:
            apq = A[p, q]
            app, aqq = A[p, p], A[q, q]
            # rotation angle zeroing A[p,q]
            tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < 1e-30,
                                                 1e-30, apq))
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            # apply Givens rotation G(p,q,theta) on both sides
            rp = c * A[p] - s * A[q]
            rq = s * A[p] + c * A[q]
            A = A.at[p].set(rp).at[q].set(rq)
            cp = c * A[:, p] - s * A[:, q]
            cq = s * A[:, p] + c * A[:, q]
            A = A.at[:, p].set(cp).at[:, q].set(cq)
            vp = c * V[:, p] - s * V[:, q]
            vq = s * V[:, p] + c * V[:, q]
            V = V.at[:, p].set(vp).at[:, q].set(vq)
    w = jnp.diagonal(A)
    order = jnp.argsort(w)
    return w[order], V[:, order]


# ---------------------------------------------------------------------------
# smallest-k eigenvectors of a PSD 12x12 (inverse subspace iteration)
# ---------------------------------------------------------------------------

def _orthonormalize_cols(X: jnp.ndarray) -> jnp.ndarray:
    """Modified Gram-Schmidt over the (few) columns of X (n, k)."""
    k = X.shape[1]
    cols = []
    for j in range(k):
        v = X[:, j]
        for u in cols:
            v = v - (u @ v) * u
        v = v / jnp.sqrt(jnp.maximum((v * v).sum(), 1e-30))
        cols.append(v)
    return jnp.stack(cols, axis=1)


@functools.lru_cache(maxsize=None)
def _subspace_init(n: int, k: int):
    """Fixed generic init (deterministic; avoids pathological alignment with
    any particular null space the way identity columns could).

    Returns host NumPy on purpose: this is lru_cached, and any jnp value
    produced while a jit trace is active is a tracer — caching it leaks the
    tracer into the next compiled program (UnexpectedTracerError on the
    second eval of a process). Callers jnp.asarray per use."""
    import numpy as np
    rs = np.random.RandomState(12345)
    return np.linalg.qr(rs.randn(n, k))[0].astype(np.float32)


def smallest_eigvecs(A: jnp.ndarray, k: int = 4, iters: int = 8
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigenvectors of the k smallest eigenvalues of a PSD matrix A (n,n),
    ascending, via shifted inverse subspace iteration + a Rayleigh-Ritz step.

    Replaces `jnp.linalg.eigh(MtM)[:, :4]` in EPnP's null-space extraction:
    only Cholesky solves (unrolled) + matmuls, so it fuses into the RANSAC
    hypothesis batch instead of dispatching 12x12 CustomCall eigh per
    hypothesis. Accuracy is that of a subspace method: the *span* converges
    geometrically (ratio lam_k/lam_{k+1} per iteration); EPnP follows with
    Gauss-Newton + LHM polish, which absorbs residual subspace error.

    CONTRACT: with a small lam_4/lam_5 gap (noisy overdetermined
    correspondence sets) the returned basis mixes the 3rd/4th vectors with
    the row space — do NOT consume epnp() output without the downstream
    Gauss-Newton + LHM refinement. tests/test_smallalg.py pins the
    acceptable subspace error down to gap ~1.5.
    """
    n = A.shape[0]
    ridge = 1e-7 * jnp.trace(A) / n + 1e-12
    L = cholesky_fixed(A + ridge * jnp.eye(n, dtype=A.dtype), n)
    X = jnp.asarray(_subspace_init(n, k))
    for _ in range(iters):
        X = chol_solve_fixed(L, X, n)
        X = _orthonormalize_cols(X)
    # Rayleigh-Ritz: rotate the basis to (approximate) eigenvectors, ordered
    B = _mm(X.T, _mm(A, X))
    B = 0.5 * (B + B.T)
    w, W = eigh4(B) if k == 4 else jnp.linalg.eigh(B)
    return w, _mm(X, W)


# ---------------------------------------------------------------------------
# optimal weighted rotation (Horn quaternion via power iteration)
# ---------------------------------------------------------------------------

def rotation_horn(X: jnp.ndarray, Y: jnp.ndarray, w: jnp.ndarray,
                  iters: int = 60) -> jnp.ndarray:
    """Optimal proper rotation R minimizing sum_i w_i |y_i - R x_i|^2 for
    CENTERED point sets X, Y (N,3), via Horn's unit-quaternion formulation.

    The maximizing quaternion is the top eigenvector of a symmetric 4x4
    built from the cross-covariance; found by shifted power iteration (4x4
    matvecs only — no SVD CustomCall, always a proper rotation, no
    reflection-sign fixup needed). Replaces the SVD route of Umeyama in the
    RANSAC/LHM hot loop.
    """
    S = jnp.einsum("n,ni,nj->ij", w, X, Y, precision=_hp)  # S_ab = sum w x_a y_b
    Sxx, Sxy, Sxz = S[0, 0], S[0, 1], S[0, 2]
    Syx, Syy, Syz = S[1, 0], S[1, 1], S[1, 2]
    Szx, Szy, Szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx]),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz]),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy]),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]),
    ])
    # shift to make the top eigenvalue dominant in magnitude (N has trace 0,
    # so lam_max >= ||N||_F / sqrt(12) > 0 unless N = 0)
    sigma = jnp.sqrt((N * N).sum()) + 1e-12
    Ns = N + sigma * jnp.eye(4, dtype=N.dtype)

    def body(_, q):
        q = _mm(Ns, q[:, None])[:, 0]
        return q / jnp.sqrt(jnp.maximum((q * q).sum(), 1e-30))

    # Two deterministic inits, mutually orthogonal: a single fixed q0 stalls
    # when the optimal quaternion happens to be (near-)orthogonal to it
    # (specific 180-degree rotations). Running both and keeping the larger
    # Rayleigh quotient covers that failure mode with 4x4 matvecs only.
    # (When the top two eigenvalues of N are close, convergence onto either
    # is slow but both candidates are then near-optimal in the objective.)
    q0 = jnp.asarray([1.0, 0.0103, 0.0211, 0.0317], N.dtype)
    q1 = jnp.asarray([-0.0103, 1.0, 0.0317, -0.0211], N.dtype)  # q0 . q1 = 0
    q0 = q0 / jnp.sqrt((q0 * q0).sum())
    q1 = q1 / jnp.sqrt((q1 * q1).sum())
    qa = jax.lax.fori_loop(0, iters, body, q0)
    qb = jax.lax.fori_loop(0, iters, body, q1)
    ra = (qa * _mm(N, qa[:, None])[:, 0]).sum()
    rb = (qb * _mm(N, qb[:, None])[:, 0]).sum()
    q = jnp.where(ra >= rb, qa, qb)
    return quat_to_rot(q)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
                   2 * (qx * qz + qw * qy)]),
        jnp.stack([2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz - qw * qx)]),
        jnp.stack([2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
                   1 - 2 * (qx * qx + qy * qy)]),
    ])
