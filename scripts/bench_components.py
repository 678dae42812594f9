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

        # Forward timing must be a SCAN-CHAINED program: K applications with
        # a true data dependence inside one dispatch. Host-looped identical
        # calls replay from a cache somewhere in the remote runtime (226%-
        # "MFU" teacher forwards persisted even with input cycling); a
        # chained scan is immune to any replay layer and measures pure
        # device throughput.
        def chained(apply_fn, k, x0):
            def prog(v, x):
                def body(c, _):
                    out = apply_fn(v, c)
                    # NOTE 1e-6, not epsilon-tiny: a 1e-20 bump underflows in f32
                    # (c + bump == c bit-exactly), the carry never changes,
                    # and a content-addressed execution cache replays the
                    # whole call (observed 4497%-MFU artifacts)
                    bump = (out[0].mean() * 1e-6).astype(c.dtype)
                    return c + bump, None
                c, _ = jax.lax.scan(body, x, None, length=k)
                return c
            jitted = jax.jit(prog)
            carry = {"x": x0}

            def call(v):
                # feed the previous (epsilon-perturbed) output back in so
                # every outer call also has fresh args — no replay possible
                carry["x"] = jitted(v, carry["x"])
                return carry["x"]

            return call

        K_FWD = 32
        fwd_s_k = chained(lambda v, x: net.apply(v, x, train=False), K_FWD,
                          batch.images)
        fwd_t_k = chained(lambda v, x: tnet.apply(v, x, train=False), K_FWD,
                          batch.images)
        t_fs = timeit(fwd_s_k, svars) / K_FWD
        spreads["student_fwd"] = round(timeit.last_spread, 3)
        t_ft = timeit(fwd_t_k, tvars) / K_FWD
        spreads["teacher_fwd"] = round(timeit.last_spread, 3)
        # Step timing via the production multi-step: K steps scanned inside
        # one dispatch with the state threading through (same replay
        # immunity as the chained forwards, and exactly what training runs)
        from kd6d_pose_adlp_tpu.engine.steps import build_multi_step
        pool1 = jax.tree_util.tree_map(lambda x: x[None], batch)
        K_STEP = 8

        def chained_step(cfg_s, cfg_tt, tn, distill, tv):
            multi = jax.jit(
                build_multi_step(cfg_s, cfg_tt, consts, net, tn, opt,
                                 distill=distill, pool_size=1),
                donate_argnums=(0,), static_argnums=(5,))
            carry = {"s": create_train_state(jax.random.PRNGKey(0), cfg_s,
                                             net, opt),
                     "r": jax.random.PRNGKey(2)}

            def call():
                s, r, m = multi(carry["s"], tv, pool1, carry["r"],
                                jnp.zeros((), jnp.int32), K_STEP)
                carry["s"], carry["r"] = s, r
                return m["loss_total"]

            return call

        t_kd = timeit(chained_step(cfg, cfg_t, tnet, True, tvars)) / K_STEP
        spreads["kd_step"] = round(timeit.last_spread, 3)
        t_base = timeit(chained_step(cfg, None, None, False, None)) / K_STEP
        spreads["baseline_step"] = round(timeit.last_spread, 3)
        cls, reg = fwd_s(svars, batch.images)
        pkey = {"k": jax.random.PRNGKey(3)}

        def post_call():
            # fresh RANSAC key per call — every request is unique
            pkey["k"], sub = jax.random.split(pkey["k"])
            return post(cls, reg, batch, sub)

        t_post = timeit(post_call)
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
