"""Pallas TPU kernel for the Sinkhorn potential solve.

The KD loss runs B x 8 independent weighted Sinkhorn problems on tiny padded
clouds (P, T <= 64). In pure XLA each of the ~13 annealing steps is 4 separate
logsumexp launches with HBM round-trips; this kernel keeps the 4 cost
matrices and all dual potentials resident in VMEM for the entire schedule.

Mosaic tiling (the round-1 failure mode, BENCH_r01): block shapes' last two
dims must be (8,128)-divisible or equal to the array dims. We therefore grid
over GROUPS OF 8 problems — blocks are (8, P[, 2]) whose trailing dims equal
the array dims — and pad the problem batch N up to a multiple of 8. The
kernel body is rank-3 (group, points, points) elementwise math, so sublanes
get the 8 problems and lanes get the cloud dimension.

Differentiability: the annealing loop is gradient-free (geomloss's
envelope-theorem treatment); the kernel returns the four final potentials and
`sinkhorn.py`-style code performs ONE differentiable extrapolation + cost
evaluation in plain JAX. Gradients are therefore identical (up to float
noise) to the pure-JAX path, which remains the CPU/debug fallback.

Reference semantics: losses/kd_loss.py:26-30 (SamplesLoss config),
losses/loss_libs.py:39-49 (invocation).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .sinkhorn import _damp, _softmin, cost_matrix, epsilon_schedule

_GROUP = 8  # problems per pallas program (sublane-dim tile)


def _pairwise_cost(x, y, p):
    """x (G,P,2), y (G,T,2) -> (G,P,T); per-coordinate broadcast keeps every
    intermediate rank-3 with lanes = cloud size. Coordinates are extracted
    with `lax.index_in_dim` (slice+squeeze) — integer indexing lowers to a 3D
    gather, which Mosaic refuses ("Only 2D gather is supported")."""
    coord = lambda v, i: jax.lax.index_in_dim(v, i, axis=2, keepdims=False)
    dx = coord(x, 0)[:, :, None] - coord(y, 0)[:, None, :]
    dy = coord(x, 1)[:, :, None] - coord(y, 1)[:, None, :]
    d2 = dx * dx + dy * dy
    if p == 2:
        return d2 * 0.5
    return jnp.sqrt(jnp.maximum(d2, 1e-20))


def _make_kernel(eps_list: Tuple[float, ...], rho: Optional[float], p: float,
                 debias: bool):

    def kernel(x_ref, y_ref, alog_ref, blog_ref,
               ax_ref, by_ref, ay_ref, bx_ref):
        x = x_ref[...]                    # (G, P, 2)
        y = y_ref[...]                    # (G, T, 2)
        a_log = alog_ref[...]             # (G, P)
        b_log = blog_ref[...]             # (G, T)

        C_xy = _pairwise_cost(x, y, p)    # (G, P, T)
        C_yx = jnp.swapaxes(C_xy, 1, 2)
        C_xx = _pairwise_cost(x, x, p)
        C_yy = _pairwise_cost(y, y, p)

        def softmin(eps, C, h):           # C (G,M,N), h (G,N) -> (G,M)
            m = h[:, None, :] - C / eps
            mx = jnp.max(m, axis=-1, keepdims=True)
            return -eps * (jnp.log(jnp.sum(jnp.exp(m - mx), axis=-1))
                           + mx[..., 0])

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

        ax_ref[...] = a_x
        by_ref[...] = b_y
        ay_ref[...] = a_y
        bx_ref[...] = b_x

    return kernel


def _build_grid_spec(n_total: int, P: int, T: int):
    """Block layout for `_solve_potentials` (n_total divisible by _GROUP).
    Every block's trailing dims equal the array's trailing dims and the
    grid-mapped leading dim is the (8-divisible) _GROUP — the exact form the
    Mosaic `_check_block_mappings` rule accepts; kept in its own function so
    tests can statically re-validate the rule on CPU (the rule itself only
    fires during TPU lowering)."""
    from jax.experimental import pallas as pl

    assert n_total % _GROUP == 0, (n_total, _GROUP)
    return pl.GridSpec(
        grid=(n_total // _GROUP,),
        in_specs=[
            pl.BlockSpec((_GROUP, P, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((_GROUP, T, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((_GROUP, P), lambda i: (i, 0)),
            pl.BlockSpec((_GROUP, T), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_GROUP, P), lambda i: (i, 0)),
            pl.BlockSpec((_GROUP, T), lambda i: (i, 0)),
            pl.BlockSpec((_GROUP, T), lambda i: (i, 0)),
            pl.BlockSpec((_GROUP, P), lambda i: (i, 0)),
        ],
    )


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
    kernel = _make_kernel(eps_list, rho, p, debias)

    n_pad = (-N) % _GROUP
    if n_pad:
        pad = lambda v: jnp.concatenate(
            [v, jnp.zeros((n_pad,) + v.shape[1:], v.dtype)], axis=0)
        x, y, a_log, b_log = pad(x), pad(y), pad(a_log), pad(b_log)
    n_total = N + n_pad

    vec = lambda n: jax.ShapeDtypeStruct((n_total, n), jnp.float32)
    grid_spec = _build_grid_spec(n_total, P, T)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[vec(P), vec(T), vec(T), vec(P)],
        interpret=interpret,
    )(x, y, a_log, b_log)
    if n_pad:
        outs = [o[:N] for o in outs]
    return tuple(outs)


def _probe_compiles(interpret: bool = False) -> bool:
    """Compile + run a tiny representative problem CONCRETELY, even when
    called from inside an active jit trace (the KD loss's gate fires during
    the train-step trace): `ensure_compile_time_eval` keeps the probe's
    arrays concrete — without it the outputs are tracers and bool() raises
    TracerBoolConversionError, silently disabling Pallas for training."""
    try:
        with jax.ensure_compile_time_eval():
            x = jnp.zeros((9, 16, 2), jnp.float32)  # 9 exercises the pad path
            y = jnp.zeros((9, 16, 2), jnp.float32)
            l = jnp.full((9, 16), -jnp.log(16.0), jnp.float32)
            outs = _solve_potentials(x, y, l, l, p=2.0, blur=1e-3, scaling=0.5,
                                     reach=0.5, diameter=2.0, debias=True,
                                     interpret=interpret)
            jax.block_until_ready(outs)
            return all(bool(jnp.isfinite(o).all()) for o in outs)
    except Exception as e:  # noqa: BLE001 — any lowering/runtime failure
        import sys
        print(f"[sinkhorn_pallas] probe failed ({type(e).__name__}); "
              f"falling back to pure-JAX Sinkhorn", file=sys.stderr)
        return False


@functools.lru_cache(maxsize=1)
def pallas_tpu_ok() -> bool:
    """One-shot probe: can the Pallas kernel lower AND execute on the current
    default backend? Any failure (Mosaic lowering rules, libtpu mismatch, no
    TPU) -> False, and the KD loss uses the pure-JAX solver instead — the
    benchmark/training path must degrade, never die (VERDICT round 1)."""
    if jax.default_backend() != "tpu":
        return False
    return _probe_compiles()


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
