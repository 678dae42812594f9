"""Pallas TPU prototype: fused 3x3 conv + BN-affine + LeakyReLU for the
narrow student stages (SURVEY §7 "Pallas where fusion pays"; VERDICT r2
next-round #3).

Why a custom kernel might pay here: darknet_tiny_h's early stages run 3-16
channel convs. A channels-in-lanes layout (NHWC) fills at most 16/128 MXU
lanes; XLA's TPU conv emitter mitigates this but the baseline student step
still idles at 6-9% MFU (BASELINE.md component table). This kernel instead
lays the feature map out as (C, H*Wp) — channels in sublanes, FLATTENED
padded spatial in lanes — and computes the conv as ONE im2col matmul:

    patches = concat_{dy,dx} x[:, dy*Wp+dx : dy*Wp+dx + H*Wp]   # (9C, M)
    out     = Wmat(O, 9C) @ patches                              # (O, M)

The nine shifted slices are STATIC lane offsets of the same VMEM-resident
slab (a lane rotate each, no gathers), and the contraction dim becomes
9*C_in (27/72/144 for C_in 3/8/16) instead of C_in — a ~9x denser MXU feed
for exactly the stages where XLA starves. The BN affine (inference form:
scale/shift; or a training-mode batch-stat application done outside) and
LeakyReLU fuse into the matmul epilogue, so the activation never round-trips
to HBM between conv and nonlinearity.

Layout contract (the "flat-spatial" form):
  - spatial is flattened WITH the width padding kept: a map of logical
    (H, W) lives in an (C, H*Wp) slab, Wp = W + 2; logical (h, w) sits at
    flat index h*Wp + w, and the LAST two columns of each row hold garbage
    (the matmul computes them as wrap-around convolutions of row ends —
    discarded by flat_to_nhwc).
  - the input slab is height-padded and 2-element tail-padded:
    (C, (H+2)*Wp + 2), so all nine static shifts dy*Wp + dx stay in-bounds.
  - `nhwc_to_flat` / `flat_to_nhwc` convert at the boundary.

Scope: FORWARD-ONLY measurement prototype. It exists to answer "does a
hand-fused conv beat XLA's on the narrow shapes?" (scripts/
bench_conv_pallas.py runs the A/B on the TPU); it is not wired into the
training path — that needs the transposed-matmul VJP pair and a
flat-layout max-pool, which are only worth building if this wins.

Reference semantics matched: ConvBNAct (models/blocks.py) == reference
backbone/common.py:250-330 conv3x3_block, inference mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def nhwc_to_flat(x):
    """(B, H, W, C) -> (B, C, (H+2)*(W+2) + 2) zero-padded flat slab."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.transpose(0, 3, 1, 2).reshape(B, C, (H + 2) * (W + 2))
    return jnp.pad(flat, ((0, 0), (0, 0), (0, 2)))


def flat_to_nhwc(y, H: int, W: int):
    """(B, O, H*(W+2)) output slab -> (B, H, W, O); logical w = column w,
    the trailing 2 columns of each row are conv wrap-around garbage."""
    B, O, _ = y.shape
    y = y.reshape(B, O, H, W + 2)[:, :, :, :W]
    return y.transpose(0, 2, 3, 1)


def _make_kernel(C: int, O: int, H: int, Wp: int, alpha: float):
    M = H * Wp

    def kernel(x_ref, w_ref, sc_ref, bi_ref, out_ref):
        x = x_ref[0]                                          # (C, L)
        # nine static lane-shifted views of the padded slab, stacked along
        # sublanes: contraction dim = 9C
        slabs = []
        for dy in range(3):
            for dx in range(3):
                off = dy * Wp + dx
                slabs.append(x[:, off:off + M])               # (C, M)
        patches = jnp.concatenate(slabs, axis=0)              # (9C, M)
        acc = jax.lax.dot_general(
            w_ref[...], patches,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (O, M) f32
        acc = acc * sc_ref[...] + bi_ref[...]                 # BN affine
        out_ref[0] = jnp.where(acc >= 0, acc, alpha * acc).astype(
            out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("H", "W", "alpha", "interpret"))
def conv3x3_bn_act_flat(x_flat, wmat, scale, bias, *, H: int, W: int,
                        alpha: float = 0.1, interpret: bool = False):
    """Fused 3x3 conv (stride 1, SAME) + affine + LeakyReLU, flat layout.

    x_flat (B, C, (H+2)*(W+2)+2) — zero-padded slab from nhwc_to_flat
    wmat   (O, 9*C)            — weights, (dy, dx, c) fastest-c order:
                                 wmat[o, (dy*3+dx)*C + c] = k[dy, dx, c, o]
    scale  (O, 1), bias (O, 1) — folded BN affine (f32)
    -> (B, O, H*(W+2)) output slab, valid height only (re-pad for chaining);
       the 2 pad columns per row contain wrap-around garbage.
    """
    from jax.experimental import pallas as pl

    B, C, L = x_flat.shape
    Wp = W + 2
    assert L == (H + 2) * Wp + 2, (L, H, Wp)
    O = wmat.shape[0]
    assert wmat.shape == (O, 9 * C), wmat.shape
    kern = _make_kernel(C, O, H, Wp, alpha)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((O, 9 * C), lambda b: (0, 0)),
            pl.BlockSpec((O, 1), lambda b: (0, 0)),
            pl.BlockSpec((O, 1), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, O, H * Wp), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, O, H * Wp), x_flat.dtype),
        interpret=interpret,
    )(x_flat, wmat, scale, bias)


def pack_weights(k):
    """(3, 3, C, O) conv kernel -> (O, 9C) matmul weights for the kernel."""
    kh, kw, C, O = k.shape
    assert (kh, kw) == (3, 3)
    return k.transpose(3, 0, 1, 2).reshape(O, 9 * C)


def conv3x3_bn_act_ref(x, k, scale, bias, alpha: float = 0.1):
    """Plain-XLA oracle with identical semantics (NHWC in/out)."""
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)
    return jnp.where(y >= 0, y, alpha * y).astype(x.dtype)


def conv3x3_bn_act(x, k, scale, bias, alpha: float = 0.1,
                   interpret: bool = False):
    """NHWC convenience wrapper: converts layout, runs the Pallas kernel,
    converts back. For benchmarking the BOUNDARY-INCLUSIVE cost; a real
    integration would keep the whole stage in flat layout."""
    B, H, W, C = x.shape
    xf = nhwc_to_flat(x)
    y = conv3x3_bn_act_flat(
        xf, pack_weights(k).astype(x.dtype),
        scale.reshape(-1, 1).astype(jnp.float32),
        bias.reshape(-1, 1).astype(jnp.float32),
        H=H, W=W, interpret=interpret)
    return flat_to_nhwc(y, H, W)
