"""Component-level throughput probe on the real chip (profiling aid).

Times, separately: student inference forward, teacher forward, baseline
(no-teacher) train step, full KD train step, device postprocess
(voting + RANSAC-EPnP), and the Sinkhorn solver (Pallas vs pure JAX),
at the reference batch and at a larger batch to show MXU-utilization
headroom. Also reports XLA cost-analysis FLOPs and the implied MFU per
component, and (with --trace) saves a jax.profiler trace of the KD step.

Run (TPU): python scripts/bench_components.py [--trace]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

V5E_BF16_PEAK = 394e12


def timeit(fn, *args, n=20, warmup=5, reps=3):
    """Median of `reps` timed blocks, after `warmup` calls.

    Through the remote tunnel a dispatch+block round trip costs ~30 ms of
    RTT, so a block whose total device time is below that measures the
    LINK, not the chip (round-3 logs: a '422% MFU' forward). The block
    size auto-calibrates: n doubles until one block exceeds 300 ms, then
    `reps` timed blocks run at that n. Spread across reps is reported via
    timeit.last_spread for the caller to sanity-check."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    while True:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        if time.perf_counter() - t0 > 0.3:
            break
        n *= 2
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n)
    times.sort()
    med = times[len(times) // 2]
    timeit.last_spread = (times[-1] - times[0]) / med
    return med


def flops_of(jitted, *args):
    try:
        return float(jitted.lower(*args).compile().cost_analysis()["flops"])
    except Exception:
        return float("nan")


def main():
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true",
                    help="save a jax.profiler trace of the KD step")
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 64])
    args = ap.parse_args()

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
    from kd6d_pose_adlp_tpu.engine.steps import (build_train_step,
                                                 create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.ops import sinkhorn as sk
    from kd6d_pose_adlp_tpu.ops.sinkhorn_pallas import (pallas_tpu_ok,
                                                        sinkhorn_divergence_pallas)

    results = {"platform": jax.devices()[0].platform}
    for bs in args.batches:
        cfg = Config(model=ModelConfig(backbone="darknet_tiny_h",
                                       compute_dtype="bfloat16"))
        cfg_t = Config(model=ModelConfig(backbone="darknet53",
                                         compute_dtype="bfloat16"))
        n_fg = cfg.data.n_fg
        ds = SyntheticPoseDataset(n_fg=n_fg, input_res=256, max_objs=8,
                                  single_class=0, seed=0)
        consts = ds.consts()
        batch = jax.device_put(ds.batch(range(bs), train=True))

        net = PoseNet(cfg=cfg.model, n_fg=n_fg)
        tnet = PoseNet(cfg=cfg_t.model, n_fg=n_fg)
        tvars = tnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3)))
        opt = make_optimizer(cfg)
        state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
        svars = {"params": state.params, "batch_stats": state.batch_stats}

        fwd_s = jax.jit(lambda v, x: net.apply(v, x, train=False))
        fwd_t = jax.jit(lambda v, x: tnet.apply(v, x, train=False))
        step_kd = jax.jit(build_train_step(cfg, cfg_t, consts, net, tnet, opt,
                                           distill=True))
        step_base = jax.jit(build_train_step(cfg, None, consts, net, None, opt,
                                             distill=False))
        post = build_postprocess(cfg, consts)

        key = jax.random.PRNGKey(2)
        spreads = {}
        # cycle DISTINCT inputs per call: repeated identical (executable,
        # args) executions short-circuit somewhere in the remote runtime
        # and report impossible rates (a 278%-"MFU" teacher forward at bs16
        # even with >0.3 s timing blocks); varying the input defeats it
        imgs = [jax.device_put(batch.images + jnp.float32(i) * 1e-6)
                for i in range(8)]
        jax.block_until_ready(imgs)
        cyc = {"i": 0}

        def fwd_s_cyc(v):
            cyc["i"] = (cyc["i"] + 1) % len(imgs)
            return fwd_s(v, imgs[cyc["i"]])

        def fwd_t_cyc(v):
            cyc["i"] = (cyc["i"] + 1) % len(imgs)
            return fwd_t(v, imgs[cyc["i"]])

        t_fs = timeit(fwd_s_cyc, svars)
        spreads["student_fwd"] = round(timeit.last_spread, 3)
        t_ft = timeit(fwd_t_cyc, tvars)
        spreads["teacher_fwd"] = round(timeit.last_spread, 3)
        t_kd = timeit(lambda s, b, r: step_kd(s, tvars, b, r), state, batch, key)
        spreads["kd_step"] = round(timeit.last_spread, 3)
        t_base = timeit(lambda s, b, r: step_base(s, None, b, r), state, batch, key)
        spreads["baseline_step"] = round(timeit.last_spread, 3)
        cls, reg = fwd_s(svars, batch.images)
        t_post = timeit(lambda c, g, b, r: post(c, g, b, r),
                        cls, reg, batch, jax.random.PRNGKey(3))
        spreads["postprocess"] = round(timeit.last_spread, 3)

        f_kd = flops_of(step_kd, state, tvars, batch, key)
        f_base = flops_of(step_base, state, None, batch, key)
        f_ft = flops_of(fwd_t, tvars, batch.images)
        f_fs = flops_of(fwd_s, svars, batch.images)

        mfu = lambda f, t: round(100 * f / t / V5E_BF16_PEAK, 2)
        results[f"bs{bs}"] = {
            "student_fwd_img_s": round(bs / t_fs, 1),
            "teacher_fwd_img_s": round(bs / t_ft, 1),
            "baseline_step_img_s": round(bs / t_base, 1),
            "kd_step_img_s": round(bs / t_kd, 1),
            "postprocess_img_s": round(bs / t_post, 1),
            "kd_step_ms": round(1e3 * t_kd, 2),
            "kd_minus_base_minus_tfwd_ms": round(1e3 * (t_kd - t_base - t_ft), 2),
            "rel_spread": spreads,
            "mfu_pct": {"student_fwd": mfu(f_fs, t_fs),
                        "teacher_fwd": mfu(f_ft, t_ft),
                        "baseline_step": mfu(f_base, t_base),
                        "kd_step": mfu(f_kd, t_kd)},
            "gflops": {"student_fwd": round(f_fs / 1e9, 1),
                       "teacher_fwd": round(f_ft / 1e9, 1),
                       "baseline_step": round(f_base / 1e9, 1),
                       "kd_step": round(f_kd / 1e9, 1)},
        }

        if args.trace and bs == args.batches[0]:
            tdir = "outputs/profile/kd_step"
            os.makedirs(tdir, exist_ok=True)
            with jax.profiler.trace(tdir):
                for _ in range(5):
                    out = step_kd(state, tvars, batch, key)
                jax.block_until_ready(out)
            results["trace_dir"] = tdir

    # Sinkhorn solver micro-bench at the production shape (B*8 problems)
    import numpy as np
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (128, 64, 2)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (128, 64, 2)), jnp.float32)
    a = jnp.asarray(rng.uniform(0.1, 1, (128, 64)), jnp.float32)
    b = jnp.asarray(rng.uniform(0.1, 1, (128, 64)), jnp.float32)
    jax_fn = jax.jit(lambda *t: sk.batched_samples_loss(*t, gtype="sinkhorn"))
    t_jax = timeit(jax_fn, x, y, a, b)
    results["sinkhorn_128x64_ms"] = {"pure_jax": round(1e3 * t_jax, 3)}
    if pallas_tpu_ok():
        pal_fn = jax.jit(lambda *t: sinkhorn_divergence_pallas(*t))
        results["sinkhorn_128x64_ms"]["pallas"] = round(
            1e3 * timeit(pal_fn, x, y, a, b), 3)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
