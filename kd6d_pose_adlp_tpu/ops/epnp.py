"""EPnP + RANSAC on device (jit/vmap-friendly, fixed shapes).

TPU-native replacement for the reference's CPU hop to
`cv2.solvePnPRansac(..., SOLVEPNP_EPNP, reprojectionError=5.0)`
(`postprocess/postprocess.py:176-196`). Weighted formulation: every routine
takes a per-correspondence weight vector, so RANSAC hypotheses are expressed
as one-hot weight rows and the whole hypothesis batch is a single `vmap` —
no data-dependent shapes anywhere.

Algorithm (standard EPnP, Lepetit et al. 2009):
  1. 4 control points from the weighted centroid + principal axes,
  2. barycentric coordinates per 3D point,
  3. M (2N x 12) from the projection constraints; null-space via eigh(MtM),
  4. beta cases N=1 and N=2 + Gauss-Newton refinement on the inter-control-
     point distances,
  5. weighted Umeyama (Procrustes) to recover (R, T).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .smallalg import (eigh3, inv3, inv4, rotation_horn, smallest_eigvecs,
                       solve_spd)

_hp = jax.lax.Precision.HIGHEST
_einsum = functools.partial(jnp.einsum, precision=_hp)
_mm = functools.partial(jnp.matmul, precision=_hp)


def umeyama(X: jnp.ndarray, Y: jnp.ndarray, w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted rigid alignment Y ~ R X + T. X,Y (N,3); w (N,) >= 0.

    Rotation via Horn's quaternion (ops/smallalg.rotation_horn) — pure
    arithmetic instead of the TPU's iterative-CustomCall 3x3 SVD, and proper
    (det=+1) by construction."""
    wn = w / jnp.maximum(w.sum(), 1e-12)
    mx = (wn[:, None] * X).sum(0)
    my = (wn[:, None] * Y).sum(0)
    R = rotation_horn(X - mx, Y - my, wn)
    T = my - _mm(R, mx[:, None])[:, 0]
    return R, T


def _control_points(pts3d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(4,3) control points: centroid + scaled principal axes."""
    wn = w / jnp.maximum(w.sum(), 1e-12)
    c0 = (wn[:, None] * pts3d).sum(0)
    d = pts3d - c0
    cov = _einsum("ni,nj->ij", wn[:, None] * d, d)
    lam, vec = eigh3(cov)                                 # ascending, analytic
    # floor RELATIVE to the largest axis: for near-planar point sets an
    # absolute 1e-6 floor leaves the 4x4 barycentric system (inv4, f32
    # cofactor expansion) nearly singular; a 1e-4-of-lam_max floor bounds its
    # condition number at ~1e2 while perturbing the control basis by <=1% of
    # the object extent (barycentric coordinates adapt to any spanning basis)
    lam = jnp.maximum(lam, 1e-4 * jnp.maximum(lam[2], 1e-2))
    axes = vec.T * jnp.sqrt(lam)[:, None]                 # (3,3) rows
    return jnp.concatenate([c0[None], c0[None] + axes], axis=0)


def _barycentric(pts3d: jnp.ndarray, ctrl: jnp.ndarray) -> jnp.ndarray:
    """alphas (N,4) with pts = alphas @ ctrl, sum(alphas)=1."""
    Chom = jnp.concatenate([ctrl.T, jnp.ones((1, 4))], axis=0)   # (4,4)
    Phom = jnp.concatenate([pts3d.T, jnp.ones((1, pts3d.shape[0]))], axis=0)
    return _mm(inv4(Chom), Phom).T                                # (N,4)


def _build_MtM(alphas, pts2n, w):
    """Weighted M^T M (12,12) from the 2N projection constraints, in
    NORMALIZED image coordinates (K = I): keeps entries O(1) so the
    null-space survives float32 (pixel-scale K would put MtM entries at
    ~1e8 and drown the small eigenvalues)."""
    N = pts2n.shape[0]
    zeros = jnp.zeros((N, 4))
    du = -pts2n[:, 0]
    dv = -pts2n[:, 1]
    # row_u[i] = [a0, 0, a0*du, a1, 0, a1*du, ...]
    ru = jnp.stack([alphas, zeros, alphas * du[:, None]], axis=2).reshape(N, 12)
    rv = jnp.stack([zeros, alphas, alphas * dv[:, None]], axis=2).reshape(N, 12)
    M = jnp.concatenate([ru, rv], axis=0)                         # (2N,12)
    ws = jnp.sqrt(jnp.maximum(jnp.concatenate([w, w]), 0.0))[:, None]
    Mw = M * ws
    return _einsum("ni,nj->ij", Mw, Mw)


def _ctrl_cam_from_betas(betas: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """betas (4,), V (4,12) kernel rows -> camera-frame control points (4,3)."""
    return _mm(betas[None], V)[0].reshape(4, 3)


def _pairwise_d2(c: jnp.ndarray) -> jnp.ndarray:
    """(4,3) -> (6,) squared distances of the 6 control-point pairs."""
    idx = jnp.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    d = c[idx[:, 0]] - c[idx[:, 1]]
    return (d * d).sum(-1)


def _gauss_newton_betas(betas, V, d2_world, iters: int = 8):
    idx = jnp.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    Vc = V.reshape(4, 4, 3)                                       # kernel k, ctrl i, xyz

    def body(_, b):
        c = _einsum("k,kic->ic", b, Vc)                           # (4,3)
        diff = c[idx[:, 0]] - c[idx[:, 1]]                        # (6,3)
        r = (diff * diff).sum(-1) - d2_world                      # (6,)
        dV = Vc[:, idx[:, 0], :] - Vc[:, idx[:, 1], :]            # (4,6,3)
        J = 2.0 * _einsum("pc,kpc->pk", diff, dV)                 # (6,4)
        JtJ = _mm(J.T, J) + 1e-9 * jnp.eye(4)
        step = solve_spd(JtJ, _mm(J.T, r[:, None])[:, 0], 4)
        return b - step

    return jax.lax.fori_loop(0, iters, body, betas)


def lhm_refine(pts3s: jnp.ndarray, rays: jnp.ndarray, w: jnp.ndarray,
               R0: jnp.ndarray, T0: jnp.ndarray, iters: int = 10
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LHM (Lu-Hager-Mjolsness) object-space refinement from an initial pose.

    Minimizes sum_i w_i |(I - P_i)(R a_i + T)|^2 where P_i projects onto the
    viewing ray of observation i (the reference ships the same algorithm as
    its torch PnP option, libs/utils.py:831-895). Every operation is 3x3 —
    float32-safe, unlike the 12x12 EPnP null-space which needs f64 precision
    at LINEMOD depth/size ratios.

    pts3s (N,3) object points; rays (N,3) = K^-1 [u v 1]; w (N,) weights.
    """
    wn = w / jnp.maximum(w.sum(), 1e-12)
    denom = (rays * rays).sum(-1, keepdims=True)
    # P_i = r r^T / (r^T r); keep factored: P x = r (r.x)/(r.r)
    sumP = _einsum("ni,nj->ij", wn[:, None] * rays / denom, rays)  # sum w P
    Cmat = inv3(jnp.eye(3) - sumP)

    def proj(x):  # (N,3) -> P_i x_i
        return rays * ((rays * x).sum(-1, keepdims=True) / denom)

    def translation(R):
        # T = C * sum w (P_i - I) R a_i
        Ra = _mm(pts3s, R.T)
        return _mm(Cmat, (wn[:, None] * (proj(Ra) - Ra)).sum(0)[:, None])[:, 0]

    def body(_, RT):
        R, T = RT
        q = proj(_mm(pts3s, R.T) + T)        # current ray projections
        R, _ = umeyama(pts3s, q, w)
        T = translation(R)
        return (R, T)

    R, T = jax.lax.fori_loop(0, iters, body, (R0, translation(R0)))
    return R, T


def epnp(pts3d: jnp.ndarray, pts2d: jnp.ndarray, K: jnp.ndarray,
         w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted EPnP. pts3d (N,3), pts2d (N,2), w (N,) >= 0 -> (R, T).

    Conditioning: image coords are normalized by K and world coords by their
    RMS spread so every linear-algebra stage works on O(1) numbers in f32.
    """
    # normalize image coordinates: K^-1 [u v 1]
    fu, fv = K[0, 0], K[1, 1]
    uc, vc = K[0, 2], K[1, 2]
    pts2n = (pts2d - jnp.stack([uc, vc])) / jnp.stack([fu, fv])
    # normalize world scale (translation scales back at the end)
    wn_ = w / jnp.maximum(w.sum(), 1e-12)
    centroid = (wn_[:, None] * pts3d).sum(0)
    scale = jnp.sqrt(jnp.maximum(
        (wn_ * ((pts3d - centroid) ** 2).sum(-1)).sum(), 1e-12))
    pts3s = pts3d / scale

    ctrl_w = _control_points(pts3s, w)
    alphas = _barycentric(pts3s, ctrl_w)
    MtM = _build_MtM(alphas, pts2n, w)
    # smallest-4 near-null subspace by inverse subspace iteration: Cholesky
    # solves + matmuls only (ops/smallalg) — no 12x12 eigh CustomCall in the
    # RANSAC hypothesis batch
    _, vecs = smallest_eigvecs(MtM, k=4)                          # ascending
    V = vecs.T                                                    # (4,12) kernel rows
    d2_world = _pairwise_d2(ctrl_w)

    def solve_with_init(betas0):
        betas = _gauss_newton_betas(betas0, V, d2_world)
        cc = _ctrl_cam_from_betas(betas, V)
        x_cam = _mm(alphas, cc)                                       # (N,3) scaled units
        # enforce positive depth
        sgn = jnp.sign((w * x_cam[:, 2]).sum())
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        x_cam = x_cam * sgn
        R, T = umeyama(pts3s, x_cam, w)
        return R, T * scale                                       # back to world units

    # case N=1: beta from distance ratio
    v1 = V[0]
    c1 = v1.reshape(4, 3)
    d2_c1 = _pairwise_d2(c1)
    b1 = (jnp.sqrt(d2_world) * jnp.sqrt(jnp.maximum(d2_c1, 1e-12))).sum() / \
        jnp.maximum(d2_c1.sum(), 1e-12)
    init1 = jnp.asarray([b1, 0.0, 0.0, 0.0])

    # case N=2: least-squares on (b11, b12, b22)
    v2 = V[1]
    c2 = v2.reshape(4, 3)
    idx = jnp.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    dv1 = c1[idx[:, 0]] - c1[idx[:, 1]]
    dv2 = c2[idx[:, 0]] - c2[idx[:, 1]]
    L = jnp.stack([(dv1 * dv1).sum(-1), 2 * (dv1 * dv2).sum(-1),
                   (dv2 * dv2).sum(-1)], axis=1)                  # (6,3)
    # least squares by (ridged) normal equations: 3x3, pure arithmetic
    LtL = _mm(L.T, L)
    LtL = LtL + (1e-9 * jnp.trace(LtL) + 1e-20) * jnp.eye(3)
    sol = _mm(inv3(LtL), _mm(L.T, d2_world[:, None]))[:, 0]
    b11, b12, b22 = sol
    b1_2 = jnp.sqrt(jnp.maximum(jnp.abs(b11), 1e-12))
    b2_2 = jnp.sqrt(jnp.maximum(jnp.abs(b22), 1e-12)) * jnp.sign(b12) * jnp.sign(b11)
    init2 = jnp.asarray([b1_2, b2_2, 0.0, 0.0])

    R1, T1 = solve_with_init(init1)
    R2, T2 = solve_with_init(init2)

    e1 = reprojection_errors(pts3d, pts2d, K, R1, T1)
    e2 = reprojection_errors(pts3d, pts2d, K, R2, T2)
    wn = w / jnp.maximum(w.sum(), 1e-12)
    use2 = (wn * e2).sum() < (wn * e1).sum()
    R = jnp.where(use2, R2, R1)
    T = jnp.where(use2, T2, T1)

    # f32 EPnP leaves ~degrees of rotation error at LINEMOD depth/size ratios
    # (the 12x12 null-space needs f64); polish with well-conditioned LHM.
    rays = jnp.concatenate([pts2n, jnp.ones_like(pts2n[:, :1])], axis=-1)
    Rr, Tr = lhm_refine(pts3s, rays, w, R, T / scale, iters=12)
    Tr = Tr * scale
    er = reprojection_errors(pts3d, pts2d, K, Rr, Tr)
    better = (wn * er).sum() < jnp.minimum((wn * e1).sum(), (wn * e2).sum())
    R = jnp.where(better, Rr, R)
    T = jnp.where(better, Tr, T)
    return R, T


def reprojection_errors(pts3d, pts2d, K, R, T) -> jnp.ndarray:
    """(N,) pixel reprojection error."""
    cam = _mm(pts3d, R.T) + T
    uv = _mm(cam, K.T)
    xy = uv[:, :2] / (uv[:, 2:3] + 1e-8)
    return jnp.sqrt(((xy - pts2d) ** 2).sum(-1) + 1e-12)


@functools.partial(jax.jit, static_argnames=("iters", "min_sample"))
def ransac_epnp(pts3d: jnp.ndarray,    # (N,3)
                pts2d: jnp.ndarray,    # (N,2)
                valid: jnp.ndarray,    # (N,) bool
                K: jnp.ndarray,
                rng: jax.Array,
                *, iters: int = 128, reproj_err: float = 5.0,
                min_sample: int = 6) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration RANSAC-EPnP. Returns (R, T, inlier_count).

    Hypotheses are sampled with Gumbel top-k over valid correspondences
    (uniform without replacement); each hypothesis runs weighted EPnP with a
    one-hot weight row; the best model (most inliers, reproj < reproj_err) is
    refit on its inliers.
    """
    N = pts3d.shape[0]
    vmask = valid.astype(jnp.float32)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(rng, (iters, N)) + logits[None]
    _, top_idx = jax.lax.top_k(g, min_sample)                     # (iters, k)
    hyp_w = jnp.zeros((iters, N)).at[
        jnp.arange(iters)[:, None], top_idx].set(1.0) * vmask[None]

    Rs, Ts = jax.vmap(lambda w: epnp(pts3d, pts2d, K, w))(hyp_w)
    errs = jax.vmap(lambda R, T: reprojection_errors(pts3d, pts2d, K, R, T))(Rs, Ts)
    inliers = (errs < reproj_err) & valid[None]                   # (iters, N)
    counts = inliers.sum(-1)
    best = jnp.argmax(counts)

    # refit on the best inlier set (fall back to all valid if degenerate)
    best_in = inliers[best]
    enough = best_in.sum() >= min_sample
    refit_w = jnp.where(enough, best_in.astype(jnp.float32), vmask)
    R, T = epnp(pts3d, pts2d, K, refit_w)

    # keep the better of {refit, best hypothesis} by inlier count
    err_refit = reprojection_errors(pts3d, pts2d, K, R, T)
    cnt_refit = ((err_refit < reproj_err) & valid).sum()
    use_refit = cnt_refit >= counts[best]
    R = jnp.where(use_refit, R, Rs[best])
    T = jnp.where(use_refit, T, Ts[best])
    n_in = jnp.maximum(cnt_refit, counts[best])
    return R, T, n_in
