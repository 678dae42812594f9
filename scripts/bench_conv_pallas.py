"""TPU A/B: Pallas fused conv3x3+affine+LeakyReLU vs XLA, narrow stages.

The decision experiment for SURVEY §7 "Pallas where fusion pays" /
VERDICT r2 #3: for every 3x3 conv shape in darknet_tiny_h (and the C=3
stem), time

  - xla:         lax.conv_general_dilated NHWC + affine + LeakyReLU
  - pallas_flat: ops/conv_pallas.conv3x3_bn_act_flat on the flat-spatial
                 layout (kernel only — layout assumed network-resident)
  - pallas_nhwc: same including the NHWC<->flat boundary conversions
                 (what a drop-in replacement would actually cost)

Replay-immune: each timed call scan-chains K applications inside one
dispatched program with a data dependence — the carry is the INPUT and
the output feeds back only a scalar bump, so arbitrary C->O shapes chain
(BASELINE.md "the replay saga"). Values are checked against the XLA
oracle on-chip before timing.

Run (TPU): python scripts/bench_conv_pallas.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax
import jax.numpy as jnp

from bench_components import timeit

# every distinct (C_in, C_out, H) 3x3-conv shape in darknet_tiny_h at
# 256^2 input (models/darknet.py DARKNET_CHANNELS['tiny-h'])
TINY_H_SHAPES = [
    ("stem_3_8_256", 3, 8, 256),
    ("s2_8_16_128", 8, 16, 128),
    ("s3_16_64_64", 16, 64, 64), ("s3_8_64_64", 8, 64, 64),
    ("s4_64_128_32", 64, 128, 32), ("s4_16_128_32", 16, 128, 32),
    ("s5_128_256_16", 128, 256, 16), ("s5_32_256_16", 32, 256, 16),
]


def chained(fn, x0, k):
    """k applications of fn inside ONE dispatched program; the carry is the
    input (shape-preserving bump), so C->O shape changes chain fine."""
    def prog(x):
        def body(c, _):
            out = fn(c)
            bump = (out.astype(jnp.float32).mean() * 1e-6).astype(c.dtype)
            return c + bump, None
        c, _ = jax.lax.scan(body, x, None, length=k)
        return c
    jitted = jax.jit(prog)
    carry = {"x": x0}

    def call():
        carry["x"] = jitted(carry["x"])
        return carry["x"]
    return call


def main():
    from kd6d_pose_adlp_tpu.ops.conv_pallas import (conv3x3_bn_act,
                                                    conv3x3_bn_act_flat,
                                                    conv3x3_bn_act_ref,
                                                    conv3x3_bn_act_stacked,
                                                    flat_to_nhwc,
                                                    nhwc_to_flat,
                                                    pack_weights,
                                                    stack_taps)
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--out", type=str, default="results/conv_pallas_ab.json")
    ap.add_argument("--cpu_smoke", action="store_true",
                    help="tiny shapes + interpret mode: validate the script "
                         "end-to-end without a chip claim")
    args = ap.parse_args()
    B, K = args.batch, args.chain

    shapes = TINY_H_SHAPES
    interpret = False
    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        shapes = [("smoke_3_8_16", 3, 8, 16), ("smoke_8_16_8", 8, 16, 8)]
        B, K, interpret = 2, 2, True

    results = {"platform": jax.devices()[0].platform, "batch": B,
               "chain": K}

    for name, C, O, H in shapes:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (B, H, H, C), jnp.bfloat16)
        k = (jax.random.normal(k2, (3, 3, C, O)) * 0.1).astype(jnp.bfloat16)
        scale = jnp.ones((O,), jnp.float32)
        bias = jnp.zeros((O,), jnp.float32)
        wmat = pack_weights(k)
        sc2, bi2 = scale.reshape(-1, 1), bias.reshape(-1, 1)
        xf = nhwc_to_flat(x)

        # on-chip value checks (bf16 tolerance) for both kernel forms
        ref32 = conv3x3_bn_act_ref(x, k, scale, bias).astype(jnp.float32)
        refmax = float(jnp.abs(ref32).max()) + 1e-9
        out = conv3x3_bn_act(x, k, scale, bias, interpret=interpret)
        rel = float(jnp.abs(out.astype(jnp.float32) - ref32).max() / refmax)
        xs = stack_taps(xf, H, H)
        out_s = flat_to_nhwc(
            conv3x3_bn_act_stacked(xs, wmat, sc2, bi2, interpret=interpret),
            H, H)
        rel_s = float(jnp.abs(out_s.astype(jnp.float32) - ref32).max()
                      / refmax)

        fn_xla = lambda c: conv3x3_bn_act_ref(c, k, scale, bias)
        fn_flat = lambda c: conv3x3_bn_act_flat(c, wmat, sc2, bi2, H=H, W=H,
                                                interpret=interpret)
        fn_nhwc = lambda c: conv3x3_bn_act(c, k, scale, bias,
                                           interpret=interpret)
        # stack-inclusive: carry is the flat slab, the timed body rebuilds
        # the (9, C, M) stack each call like a drop-in layer would
        fn_stack = lambda c: conv3x3_bn_act_stacked(
            stack_taps(c, H, H), wmat, sc2, bi2, interpret=interpret)

        r = {"rel_err_vs_xla": round(rel, 6),
             "rel_err_stacked": round(rel_s, 6)}
        r["xla_ms"] = round(1e3 * timeit(chained(fn_xla, x, K)) / K, 4)
        r["pallas_flat_ms"] = round(
            1e3 * timeit(chained(fn_flat, xf, K)) / K, 4)
        r["pallas_stack_ms"] = round(
            1e3 * timeit(chained(fn_stack, xf, K)) / K, 4)
        r["pallas_nhwc_ms"] = round(
            1e3 * timeit(chained(fn_nhwc, x, K)) / K, 4)
        r["speedup_flat"] = round(r["xla_ms"] / r["pallas_flat_ms"], 3)
        r["speedup_stack"] = round(r["xla_ms"] / r["pallas_stack_ms"], 3)
        r["speedup_nhwc"] = round(r["xla_ms"] / r["pallas_nhwc_ms"], 3)
        gflop = 2 * B * H * H * O * 9 * C / 1e9
        r["gflop"] = round(gflop, 3)
        results[name] = r
        print(json.dumps({name: r}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    # --- chained serving segment (VERDICT r4 next #5b): stem -> pool ->
    # s2 -> pool entirely in flat/channel-major layout (ONE transpose in at
    # C=3, ONE out at H/4) vs the same segment in plain XLA NHWC. This is
    # the conversion-free chaining the per-layer table above cannot see —
    # the bankability test for a serving-only Pallas stem.
    from kd6d_pose_adlp_tpu.ops.conv_pallas import stem_s2_segment_flat

    H = 16 if args.cpu_smoke else 256
    O1, O2 = 8, 16  # tiny_h stem/s2 widths
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (B, H, H, 3), jnp.bfloat16)
    kw1 = (jax.random.normal(k2, (3, 3, 3, O1)) * 0.1).astype(jnp.bfloat16)
    kw2 = (jax.random.normal(k3, (3, 3, O1, O2)) * 0.1).astype(jnp.bfloat16)
    sc1 = jnp.ones((O1,), jnp.float32)
    bi1 = jnp.zeros((O1,), jnp.float32)
    sc2 = jnp.ones((O2,), jnp.float32)
    bi2 = jnp.zeros((O2,), jnp.float32)
    w1p, w2p = pack_weights(kw1), pack_weights(kw2)
    s1c, b1c = sc1.reshape(-1, 1), bi1.reshape(-1, 1)
    s2c, b2c = sc2.reshape(-1, 1), bi2.reshape(-1, 1)

    def pool_nhwc(v):
        return jax.lax.reduce_window(
            v, -jnp.inf if v.dtype == jnp.float32 else jnp.finfo(v.dtype).min,
            jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def seg_xla(c):
        y = conv3x3_bn_act_ref(c, kw1, sc1, bi1)
        y = pool_nhwc(y)
        y = conv3x3_bn_act_ref(y, kw2, sc2, bi2)
        return pool_nhwc(y)

    def seg_pallas(c, stacked=False):
        return stem_s2_segment_flat(c, w1p, s1c, b1c, w2p, s2c, b2c,
                                    interpret=interpret, stacked=stacked)

    ref32 = seg_xla(x).astype(jnp.float32)
    refmax = float(jnp.abs(ref32).max()) + 1e-9
    rel_seg = float(jnp.abs(seg_pallas(x).astype(jnp.float32) - ref32).max()
                    / refmax)
    rel_seg_st = float(jnp.abs(
        seg_pallas(x, stacked=True).astype(jnp.float32) - ref32).max()
        / refmax)
    # the segment changes spatial dims H -> H/4, so the shape-preserving
    # chained() carry trick works on the INPUT with a scalar bump
    r = {"rel_err_vs_xla": round(rel_seg, 6),
         "rel_err_stacked": round(rel_seg_st, 6)}
    r["xla_ms"] = round(1e3 * timeit(chained(seg_xla, x, K)) / K, 4)
    r["pallas_flat_ms"] = round(
        1e3 * timeit(chained(seg_pallas, x, K)) / K, 4)
    r["pallas_stack_ms"] = round(1e3 * timeit(chained(
        lambda c: seg_pallas(c, stacked=True), x, K)) / K, 4)
    r["speedup_flat"] = round(r["xla_ms"] / r["pallas_flat_ms"], 3)
    r["speedup_stack"] = round(r["xla_ms"] / r["pallas_stack_ms"], 3)
    results["segment_stem_s2"] = r
    print(json.dumps({"segment_stem_s2": r}), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)

    print("CONV-PALLAS-AB-DONE", flush=True)


if __name__ == "__main__":
    main()
