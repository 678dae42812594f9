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

The nine taps are STATIC lane rotates of the same VMEM-resident slab
(pltpu.roll — no gathers), each contracted against its own (O, C) weight
slice and ACCUMULATED in f32. Round 3 tried a single (9C, M) matmul built
by jnp.concatenate of the nine shifted slices; Mosaic refuses to lower
that concat ("result/input offset mismatch on non-concat dimension",
results/r3_chain5.log 03:27:55) because the operands carry different lane
offsets. The accumulated-dot form has identical FLOPs, needs no (9C, M)
patches buffer in VMEM, and every dot operand starts at lane 0. The BN
affine (inference form: scale/shift; or a training-mode batch-stat
application done outside) and LeakyReLU fuse into the matmul epilogue, so
the activation never round-trips to HBM between conv and nonlinearity.

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
        from jax.experimental.pallas import tpu as pltpu
        # Mosaic implements lane rotates only for 32-bit element types
        # ("Rotate with non-32-bit data: not implemented",
        # results/r4_chain.log 09:28) — cast the slab once; the taps and
        # dots then run in f32. For the stay-bf16 alternative see
        # conv3x3_bn_act_stacked (shifts hoisted outside the kernel).
        x = x_ref[0].astype(jnp.float32)                      # (C, L)
        L = x.shape[1]
        w = w_ref[...].astype(jnp.float32)                    # (9, O, C)
        # nine accumulated (O, C) @ (C, M) taps; each operand is a lane
        # rotate of the slab truncated at lane 0 (x[:, off:off+M] ==
        # roll(x, L-off)[:, :M] since off+M <= L; pltpu.roll wants the
        # shift non-negative), which Mosaic lowers cleanly where the
        # round-3 shifted-slice concat did not
        acc = sc_ref[...] * 0.0  # (O, 1) f32, broadcasts into the sum
        for tap in range(9):
            dy, dx = divmod(tap, 3)
            off = dy * Wp + dx
            shifted = pltpu.roll(x, L - off, 1)[:, :M] if off else x[:, :M]
            acc = acc + jax.lax.dot_general(
                w[tap], shifted,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (O, M) f32
        acc = acc * sc_ref[...] + bi_ref[...]                 # BN affine
        out_ref[0] = jnp.where(acc >= 0, acc, alpha * acc).astype(
            out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("H", "W", "alpha", "interpret"))
def conv3x3_bn_act_flat(x_flat, wmat, scale, bias, *, H: int, W: int,
                        alpha: float = 0.1, interpret: bool = False):
    """Fused 3x3 conv (stride 1, SAME) + affine + LeakyReLU, flat layout.

    x_flat (B, C, (H+2)*(W+2)+2) — zero-padded slab from nhwc_to_flat
    wmat   (9, O, C)           — per-tap weights from pack_weights:
                                 wmat[dy*3+dx, o, c] = k[dy, dx, c, o]
    scale  (O, 1), bias (O, 1) — folded BN affine (f32)
    -> (B, O, H*(W+2)) output slab, valid height only (re-pad for chaining);
       the 2 pad columns per row contain wrap-around garbage.
    """
    from jax.experimental import pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    B, C, L = x_flat.shape
    Wp = W + 2
    assert L == (H + 2) * Wp + 2, (L, H, Wp)
    O = wmat.shape[1]
    assert wmat.shape == (9, O, C), wmat.shape
    kern = _make_kernel(C, O, H, Wp, alpha)
    return pl.pallas_call(
        kern,
        # the 256² stem's f32 slab + roll temporaries + f32 acc exceed the
        # 16 MB default scoped-vmem limit (18.65M OOM, results/conv_ab_r4.log
        # 11:44); v5e VMEM is 128 MB — raise the scope for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((9, O, C), lambda b: (0, 0, 0)),
            pl.BlockSpec((O, 1), lambda b: (0, 0)),
            pl.BlockSpec((O, 1), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, O, H * Wp), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, O, H * Wp), x_flat.dtype),
        interpret=interpret,
    )(x_flat, wmat, scale, bias)


def stack_taps(x_flat, H: int, W: int):
    """(B, C, L) padded slab -> (B, 9, C, M) pre-shifted tap stack.

    XLA-side companion of conv3x3_bn_act_stacked: the nine static lane
    shifts move OUT of the kernel (nine cheap fused slices of one array),
    so the kernel body is pure lane-0 dots and stays in bf16 — Mosaic
    rotates only 32-bit data, so the in-kernel-roll form pays an f32 cast.
    Cost: 9x the input's HBM footprint for the stacked operand.
    """
    B, C, L = x_flat.shape
    Wp = W + 2
    M = H * Wp
    assert L == (H + 2) * Wp + 2, (L, H, Wp)
    return jnp.stack([x_flat[:, :, dy * Wp + dx: dy * Wp + dx + M]
                      for dy in range(3) for dx in range(3)], axis=1)


def _make_kernel_stacked(alpha: float):
    def kernel(xs_ref, w_ref, sc_ref, bi_ref, out_ref):
        acc = sc_ref[...] * 0.0                               # (O, 1) f32
        for tap in range(9):
            acc = acc + jax.lax.dot_general(
                w_ref[tap], xs_ref[0, tap],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (O, M) f32
        acc = acc * sc_ref[...] + bi_ref[...]
        out_ref[0] = jnp.where(acc >= 0, acc, alpha * acc).astype(
            out_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def conv3x3_bn_act_stacked(xs, wmat, scale, bias, *, alpha: float = 0.1,
                           interpret: bool = False):
    """Fused conv as 9 accumulated bf16 dots over a pre-stacked tap slab.

    xs (B, 9, C, M) from stack_taps; wmat/scale/bias as conv3x3_bn_act_flat.
    -> (B, O, M) output slab (same layout contract as the flat form).
    """
    from jax.experimental import pallas as pl

    from jax.experimental.pallas import tpu as pltpu

    B, nine, C, M = xs.shape
    assert nine == 9, xs.shape
    O = wmat.shape[1]
    assert wmat.shape == (9, O, C), wmat.shape
    kern = _make_kernel_stacked(alpha)
    return pl.pallas_call(
        kern,
        # same scoped-vmem headroom as the flat form (stem shapes carry
        # multi-MB spatial slabs per block)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 9, C, M), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((9, O, C), lambda b: (0, 0, 0)),
            pl.BlockSpec((O, 1), lambda b: (0, 0)),
            pl.BlockSpec((O, 1), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, O, M), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, O, M), xs.dtype),
        interpret=interpret,
    )(xs, wmat, scale, bias)


def pack_weights(k):
    """(3, 3, C, O) conv kernel -> (9, O, C) per-tap matmul weights."""
    kh, kw, C, O = k.shape
    assert (kh, kw) == (3, 3)
    return k.reshape(9, C, O).transpose(0, 2, 1)


def pool2x2_flat(y, H: int, W: int):
    """2x2/stride-2 max pool on a conv OUTPUT slab, staying channel-major.

    y (B, O, H*(W+2)) from conv3x3_bn_act_flat -> (B, O, (H/2+2)*(W/2+2)+2),
    the zero-padded INPUT slab for the next flat conv. The whole op is
    reshapes + a windowed max in (B, C, H, W) layout — channels never move
    between sublanes and lanes, so chaining stem -> pool -> s2 pays NO
    NHWC<->flat transpose between the two kernels (VERDICT r4 next #5b:
    the per-layer A/B showed boundary conversions eating the kernel win;
    this is the conversion-free chaining that test targets). Forward-only
    (reshape+max gradient splits ties — irrelevant for serving; see
    models/blocks.max_pool_2x2 for why training must not use this)."""
    B, O, _ = y.shape
    v = y.reshape(B, O, H, W + 2)[:, :, :, :W]
    v = v.reshape(B, O, H // 2, 2, W // 2, 2).max(axis=(3, 5))
    vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1)))
    flat = vp.reshape(B, O, (H // 2 + 2) * (W // 2 + 2))
    return jnp.pad(flat, ((0, 0), (0, 0), (0, 2)))


def pool2x2_slab_to_nhwc(y, H: int, W: int):
    """2x2/stride-2 max pool on a conv output slab, then convert to NHWC:
    (B, O, H*(W+2)) -> (B, H/2, W/2, O). The single layout transpose of the
    chained segment, paid at the SMALLEST map (post-pool)."""
    B, O, _ = y.shape
    v = y.reshape(B, O, H, W + 2)[:, :, :, :W]
    v = v.reshape(B, O, H // 2, 2, W // 2, 2).max(axis=(3, 5))
    return v.transpose(0, 2, 3, 1)


def stem_s2_segment_flat(x, w1, sc1, bi1, w2, sc2, bi2, *,
                         alpha: float = 0.1, interpret: bool = False,
                         stacked: bool = False):
    """The serving-stem segment — stem conv -> pool -> s2 conv -> pool —
    entirely in flat/channel-major layout, with ONE cheap transpose in
    (C=3 image) and ONE out (post-pool at H/4).

    x  (B, H, W, 3) NHWC image crop
    w1 (9, O1, 3), sc1/bi1 (O1, 1): packed stem weights + folded affine
    w2 (9, O2, O1), sc2/bi2 (O2, 1): packed s2 weights + folded affine
    -> (B, H/4, W/4, O2) NHWC, bit-comparable to
       pool(conv(pool(conv(x)))) with conv3x3_bn_act_ref semantics.
    """
    B, H, W, C = x.shape
    xf = nhwc_to_flat(x)
    if stacked:
        y1 = conv3x3_bn_act_stacked(stack_taps(xf, H, W), w1, sc1, bi1,
                                    alpha=alpha, interpret=interpret)
    else:
        y1 = conv3x3_bn_act_flat(xf, w1, sc1, bi1, H=H, W=W, alpha=alpha,
                                 interpret=interpret)
    x2 = pool2x2_flat(y1, H, W)
    H2, W2 = H // 2, W // 2
    if stacked:
        y2 = conv3x3_bn_act_stacked(stack_taps(x2, H2, W2), w2, sc2, bi2,
                                    alpha=alpha, interpret=interpret)
    else:
        y2 = conv3x3_bn_act_flat(x2, w2, sc2, bi2, H=H2, W=W2, alpha=alpha,
                                 interpret=interpret)
    return pool2x2_slab_to_nhwc(y2, H2, W2)


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
