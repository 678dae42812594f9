"""Pallas TPU kernel for the Sinkhorn potential solve.

The KD loss runs B x 8 independent weighted Sinkhorn problems on tiny padded
clouds (P, T <= 64). In pure XLA each of the ~13 annealing steps is 4 separate
logsumexp launches with HBM round-trips; this kernel keeps the 4 cost
matrices and all dual potentials resident in VMEM for the entire schedule —
one program per OT problem, grid over the problem batch.

Differentiability: the annealing loop is gradient-free (geomloss's
envelope-theorem treatment); the kernel returns the four final potentials and
`sinkhorn.py`-style code performs ONE differentiable extrapolation + cost
evaluation in plain JAX. Gradients are therefore identical (up to float
noise) to the pure-JAX path, which remains the CPU/debug fallback.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .sinkhorn import _damp, _softmin, cost_matrix, epsilon_schedule


def _cost(x, y, p):
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    if p == 2:
        return d2 * 0.5
    return jnp.sqrt(jnp.maximum(d2, 1e-20))


def _make_kernel(P: int, T: int, eps_list: Tuple[float, ...],
                 rho: Optional[float], p: float, debias: bool):

    def kernel(x_ref, y_ref, alog_ref, blog_ref,
               ax_ref, by_ref, ay_ref, bx_ref):
        x = x_ref[0]                      # (P, 2)
        y = y_ref[0]                      # (T, 2)
        a_log = alog_ref[0]               # (P,)
        b_log = blog_ref[0]               # (T,)

        C_xy = _cost(x, y, p)             # (P, T)
        C_yx = C_xy.T
        C_xx = _cost(x, x, p)
        C_yy = _cost(y, y, p)

        def softmin(eps, C, h):
            m = h[None, :] - C / eps
            mx = jnp.max(m, axis=1, keepdims=True)
            return -eps * (jnp.log(jnp.sum(jnp.exp(m - mx), axis=1))
                           + mx[:, 0])

        eps0 = eps_list[0]
        lam = _damp(eps0, rho)
        b_x = lam * softmin(eps0, C_xy, b_log)
        a_y = lam * softmin(eps0, C_yx, a_log)
        a_x = lam * softmin(eps0, C_xx, a_log) if debias else jnp.zeros_like(b_x)
        b_y = lam * softmin(eps0, C_yy, b_log) if debias else jnp.zeros_like(a_y)

        for eps in eps_list[1:]:
            lam = _damp(eps, rho)
            bt_x = lam * softmin(eps, C_xy, b_log + a_y / eps)
            at_y = lam * softmin(eps, C_yx, a_log + b_x / eps)
            b_x = 0.5 * (b_x + bt_x)
            a_y = 0.5 * (a_y + at_y)
            if debias:
                at_x = lam * softmin(eps, C_xx, a_log + a_x / eps)
                bt_y = lam * softmin(eps, C_yy, b_log + b_y / eps)
                a_x = 0.5 * (a_x + at_x)
                b_y = 0.5 * (b_y + bt_y)

        ax_ref[0] = a_x
        by_ref[0] = b_y
        ay_ref[0] = a_y
        bx_ref[0] = b_x

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "blur", "scaling", "reach",
                                             "diameter", "debias", "interpret"))
def _solve_potentials(x, y, a_log, b_log, *, p, blur, scaling, reach,
                      diameter, debias, interpret=False):
    """x (N,P,2), y (N,T,2), logs (N,P)/(N,T) -> (a_x, b_y, a_y, b_x)."""
    from jax.experimental import pallas as pl

    N, P, _ = x.shape
    T = y.shape[1]
    rho = None if reach is None else float(reach) ** p
    eps_list = epsilon_schedule(p, diameter, blur, scaling)
    kernel = _make_kernel(P, T, eps_list, rho, p, debias)

    vec = lambda n: jax.ShapeDtypeStruct((N, n), jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, P, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, T, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, P), lambda i: (i, 0)),
            pl.BlockSpec((1, T), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, P), lambda i: (i, 0)),
            pl.BlockSpec((1, T), lambda i: (i, 0)),
            pl.BlockSpec((1, T), lambda i: (i, 0)),
            pl.BlockSpec((1, P), lambda i: (i, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[vec(P), vec(T), vec(T), vec(P)],
        interpret=interpret,
    )(x, y, a_log, b_log)


def sinkhorn_divergence_pallas(x, y, a, b, *, p: float = 2.0, blur: float = 1e-3,
                               scaling: float = 0.5, reach: Optional[float] = 0.5,
                               diameter: float = 2.0, debias: bool = True,
                               interpret: bool = False):
    """Batched debiased Sinkhorn divergence with the potential solve fused in
    Pallas. x (..., P, 2), y (..., T, 2), a (..., P), b (..., T) -> (...)."""
    batch_shape = x.shape[:-2]
    P, T = x.shape[-2], y.shape[-2]
    xf = x.reshape(-1, P, 2)
    yf = y.reshape(-1, T, 2)
    af = a.reshape(-1, P)
    bf = b.reshape(-1, T)

    from .sinkhorn import _safe_log_weights
    a_log = _safe_log_weights(af)
    b_log = _safe_log_weights(bf)

    pots = _solve_potentials(
        jax.lax.stop_gradient(xf), jax.lax.stop_gradient(yf),
        jax.lax.stop_gradient(a_log), jax.lax.stop_gradient(b_log),
        p=p, blur=blur, scaling=scaling, reach=reach, diameter=diameter,
        debias=debias, interpret=interpret)
    a_x0, b_y0, a_y0, b_x0 = [jax.lax.stop_gradient(t) for t in pots]

    # differentiable final extrapolation (mirrors sinkhorn.sinkhorn_divergence)
    rho = None if reach is None else float(reach) ** p
    eps = epsilon_schedule(p, diameter, blur, scaling)[-1]
    lam = _damp(eps, rho)

    def one(xi, yi, ali, bli, ax0, by0, ay0, bx0, ai, bi):
        C_xy = cost_matrix(xi, yi, p)
        C_yx = C_xy.T
        b_x = lam * _softmin(eps, C_xy, bli + ay0 / eps)
        a_y = lam * _softmin(eps, C_yx, ali + bx0 / eps)
        if debias:
            C_xx = cost_matrix(xi, xi, p)
            C_yy = cost_matrix(yi, yi, p)
            a_x = lam * _softmin(eps, C_xx, ali + ax0 / eps)
            b_y = lam * _softmin(eps, C_yy, bli + by0 / eps)
        if rho is None:
            if debias:
                return (ai * (b_x - a_x)).sum() + (bi * (a_y - b_y)).sum()
            return (ai * b_x).sum() + (bi * a_y).sum()
        wgt = rho + eps / 2.0
        if debias:
            fx = jnp.exp(-a_x / rho) - jnp.exp(-b_x / rho)
            fy = jnp.exp(-b_y / rho) - jnp.exp(-a_y / rho)
        else:
            fx = 1.0 - jnp.exp(-b_x / rho)
            fy = 1.0 - jnp.exp(-a_y / rho)
        return wgt * ((ai * fx).sum() + (bi * fy).sum())

    vals = jax.vmap(one)(xf, yf, a_log, b_log, a_x0, b_y0, a_y0, b_x0, af, bf)
    return vals.reshape(batch_shape)
