"""Batched entropic optimal transport for weighted 2D point clouds.

TPU-native replacement for `geomloss.SamplesLoss` as used by the reference KD
loss (`losses/kd_loss.py:26-30`: sinkhorn, p=2, blur=0.001, scaling=0.5,
reach=0.5, weighted clouds). Semantics follow geomloss's debiased, unbalanced
Sinkhorn divergence with epsilon-scaling:

    cost      C(x,y) = |x-y|^p / p          (p in {1,2})
    epsilon   = blur^p,  rho = reach^p (None => balanced)
    schedule  eps: diameter^p -> blur^p, multiplied by scaling^p each step
    damping   lambda = 1 / (1 + eps/rho)
    softmin   f(x) = -eps * logsumexp_y [ log beta(y) + g(y)/eps - C(x,y)/eps ]
    updates   symmetric (Jacobi + 0.5-averaging), final extrapolation with
              gradient flowing only through the last softmin (envelope theorem)
    value     debiased:   <alpha, b_x - a_x> + <beta, a_y - b_y>        (balanced)
              unbalanced: (rho + eps/2) * [ <alpha, e^(-a_x/rho) - e^(-b_x/rho)>
                                          + <beta,  e^(-b_y/rho) - e^(-a_y/rho)> ]

Zero-weight points are exact padding: they drop out of every logsumexp and of
the final inner products, so fixed-size padded clouds give the same value as
variable-size ones. Everything is fixed-shape; the schedule length is static
(diameter is a compile-time bound, default 2.0 for normalized image coords).

Also provides the kernel MMD losses (energy / gaussian / laplacian) geomloss
exposes under the same API, used by the reference's `--gtype` ablations.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


def cost_matrix(x: jnp.ndarray, y: jnp.ndarray, p: float) -> jnp.ndarray:
    """(N,D),(M,D) -> (N,M) with C = |x-y|^p / p."""
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    if p == 2:
        return d2 / 2.0
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    if p == 1:
        return d
    return (d ** p) / p


def epsilon_schedule(p: float, diameter: float, blur: float, scaling: float) -> Tuple[float, ...]:
    """geomloss-style annealing: eps from diameter^p down to blur^p."""
    eps_list = [diameter ** p]
    e = math.log(diameter)
    target = math.log(blur)
    step = math.log(scaling)  # negative
    while e + step > target:
        e += step
        eps_list.append(math.exp(p * e))
    eps_list.append(blur ** p)
    return tuple(eps_list)


def _safe_log_weights(w: jnp.ndarray) -> jnp.ndarray:
    """log(w) with exactly-zero padding weights mapped to -1e30, written with
    the double-where pattern so the gradient at w == 0 is 0, not NaN."""
    w_safe = jnp.where(w > 0, w, 1.0)
    return jnp.where(w > 0, jnp.log(w_safe), _NEG_BIG)


def _softmin(eps: float, C: jnp.ndarray, h_log: jnp.ndarray) -> jnp.ndarray:
    """f_i = -eps * logsumexp_j (h_log_j - C_ij/eps); h_log already includes
    log-weights (padded points carry h_log ~ -1e30 and vanish)."""
    return -eps * jax.nn.logsumexp(h_log[None, :] - C / eps, axis=1)


def _damp(eps: float, rho: Optional[float]) -> float:
    return 1.0 if rho is None else 1.0 / (1.0 + eps / rho)


def sinkhorn_divergence(x: jnp.ndarray, y: jnp.ndarray,
                        a: jnp.ndarray, b: jnp.ndarray,
                        *, p: float = 2.0, blur: float = 1e-3,
                        scaling: float = 0.5, reach: Optional[float] = 0.5,
                        diameter: float = 2.0, debias: bool = True) -> jnp.ndarray:
    """Single-problem debiased Sinkhorn divergence S(alpha, beta).

    x (N,D), y (M,D); a (N,), b (M,) nonnegative masses (0 = padding).
    Returns a scalar. Differentiable w.r.t. x, y, a, b.
    """
    rho = None if reach is None else float(reach) ** p
    eps_list = epsilon_schedule(p, diameter, blur, scaling)

    a_log = _safe_log_weights(a)
    b_log = _safe_log_weights(b)

    # potentials are solved with gradients off; the value re-attaches gradients
    # through one extrapolation step (geomloss's envelope-theorem trick)
    xd, yd = jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)
    ad_log, bd_log = jax.lax.stop_gradient(a_log), jax.lax.stop_gradient(b_log)
    C_xy_d = cost_matrix(xd, yd, p)
    C_yx_d = C_xy_d.T
    C_xx_d = cost_matrix(xd, xd, p)
    C_yy_d = cost_matrix(yd, yd, p)

    eps = eps_list[0]
    lam = _damp(eps, rho)
    b_x = lam * _softmin(eps, C_xy_d, bd_log)   # beta-potential on x
    a_y = lam * _softmin(eps, C_yx_d, ad_log)   # alpha-potential on y
    a_x = lam * _softmin(eps, C_xx_d, ad_log) if debias else None
    b_y = lam * _softmin(eps, C_yy_d, bd_log) if debias else None

    for eps in eps_list[1:]:
        lam = _damp(eps, rho)
        bt_x = lam * _softmin(eps, C_xy_d, bd_log + a_y / eps)
        at_y = lam * _softmin(eps, C_yx_d, ad_log + b_x / eps)
        b_x = 0.5 * (b_x + bt_x)
        a_y = 0.5 * (a_y + at_y)
        if debias:
            at_x = lam * _softmin(eps, C_xx_d, ad_log + a_x / eps)
            bt_y = lam * _softmin(eps, C_yy_d, bd_log + b_y / eps)
            a_x = 0.5 * (a_x + at_x)
            b_y = 0.5 * (b_y + bt_y)

    # final extrapolation with live x, y, a, b
    eps = eps_list[-1]
    lam = _damp(eps, rho)
    C_xy = cost_matrix(x, y, p)
    C_yx = C_xy.T
    b_x = lam * _softmin(eps, C_xy, b_log + jax.lax.stop_gradient(a_y) / eps)
    a_y = lam * _softmin(eps, C_yx, a_log + jax.lax.stop_gradient(b_x) / eps)
    if debias:
        C_xx = cost_matrix(x, x, p)
        C_yy = cost_matrix(y, y, p)
        a_x = lam * _softmin(eps, C_xx, a_log + jax.lax.stop_gradient(a_x) / eps)
        b_y = lam * _softmin(eps, C_yy, b_log + jax.lax.stop_gradient(b_y) / eps)

    if rho is None:
        if debias:
            return (a * (b_x - a_x)).sum() + (b * (a_y - b_y)).sum()
        return (a * b_x).sum() + (b * a_y).sum()
    w = rho + eps / 2.0
    if debias:
        fx = jnp.exp(-a_x / rho) - jnp.exp(-b_x / rho)
        fy = jnp.exp(-b_y / rho) - jnp.exp(-a_y / rho)
    else:
        fx = 1.0 - jnp.exp(-b_x / rho)
        fy = 1.0 - jnp.exp(-a_y / rho)
    return w * ((a * fx).sum() + (b * fy).sum())


def _kernel(x, y, gtype: str, blur: float, p: float) -> jnp.ndarray:
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    if gtype == "energy":
        return -d
    if gtype == "gaussian":
        return jnp.exp(-d2 / (2.0 * blur * blur))
    if gtype == "laplacian":
        return jnp.exp(-d / blur)
    # "l1"/"l2" are argparse choices in the reference
    # (arguments/argument_kd.py:39) that are passed verbatim into
    # geomloss.SamplesLoss (losses/kd_loss.py:26), which only accepts
    # {sinkhorn, hausdorff, energy, gaussian, laplacian} — i.e. they CRASH in
    # the reference and were never runnable ablations. We keep them alive as
    # conditionally-negative-definite energy kernels of the matching degree
    # (|.| and |.|^2), which is the closest meaningful interpretation.
    if gtype == "l1":
        return -d
    if gtype == "l2":
        return -d2
    raise ValueError(gtype)


def kernel_loss(x, y, a, b, *, gtype: str, blur: float = 0.5, p: float = 2.0) -> jnp.ndarray:
    """MMD-style kernel loss: 0.5<a,K_xx a> + 0.5<b,K_yy b> - <a,K_xy b>
    (geomloss kernel_samples semantics)."""
    Kxx = _kernel(x, x, gtype, blur, p)
    Kyy = _kernel(y, y, gtype, blur, p)
    Kxy = _kernel(x, y, gtype, blur, p)
    return (0.5 * a @ Kxx @ a + 0.5 * b @ Kyy @ b - a @ Kxy @ b)


def samples_loss(x, y, a, b, *, gtype: str = "sinkhorn", p: float = 2.0,
                 blur: float = 1e-3, scaling: float = 0.5,
                 reach: Optional[float] = 0.5, diameter: float = 2.0) -> jnp.ndarray:
    """geomloss.SamplesLoss-style dispatcher (reference losses/kd_loss.py:26-30)."""
    if gtype == "sinkhorn":
        return sinkhorn_divergence(x, y, a, b, p=p, blur=blur, scaling=scaling,
                                   reach=reach, diameter=diameter)
    return kernel_loss(x, y, a, b, gtype=gtype, blur=blur, p=p)


# Batched version over leading axes: clouds (..., N, D)/(..., M, D),
# weights (..., N)/(..., M) -> (...) losses.
def batched_samples_loss(x, y, a, b, **kw):
    fn = functools.partial(samples_loss, **kw)
    for _ in range(x.ndim - 2):
        fn = jax.vmap(fn)
    return fn(x, y, a, b)
