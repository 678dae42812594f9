"""One-process TPU perf suite: teacher BN folding + narrow-stage experiments.

VERDICT r2 next-round items #2/#3. Measures, replay-immune (scan-chained
programs, state threading through — see scripts/bench_components.timeit):

  1. Teacher (darknet53) forward: BN folded vs unfolded, bs 16/64.
  2. Full KD train step: folded vs unfolded teacher, bs 16/64.
  3. Baseline (no-teacher) train step + student forward across the
     narrow-stage experiments: darknet_tiny_h (reference widths) vs
     darknet_tiny_h_wide (lane-padded >=32ch) vs darknet_tiny_h_s2d
     (space-to-depth stem) — if the narrow convs are lane-bound, wide is
     ~free; s2d halves stage-1 FLOPs outright.
  4. Optional (--train_ab): 2.5k-step accuracy A/B of the three student
     variants on the synthetic pool, to gate any default change.

Run: nohup python scripts/run_perf_suite.py --train_ab > results/perf_suite.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp

from bench_components import V5E_BF16_PEAK, flops_of, timeit


def main():
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 64])
    ap.add_argument("--train_ab", action="store_true")
    ap.add_argument("--ab_steps", type=int, default=2500)
    ap.add_argument("--out", type=str, default="results/perf_suite.json")
    ap.add_argument("--cpu_smoke", action="store_true",
                    help="CPU backend + 128px + tiny counts: validates the "
                         "script end-to-end without a chip (timings are "
                         "meaningless)")
    args = ap.parse_args()

    res = 256
    K, KS = 16, 8  # chained forwards / steps per timing dispatch
    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        res = 128  # smallest with the full P3..P7 pyramid (P7 stride 128)
        args.batches = [2]
        args.ab_steps = min(args.ab_steps, 8)
        args.out = "results/perf_suite_cpu_smoke.json"
        K, KS = 2, 2
        global timeit
        _t = timeit
        timeit = lambda fn, *a: _t(fn, *a, n=1, warmup=1, reps=1)  # noqa: E731

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.steps import (build_multi_step,
                                                 create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm

    results = {"platform": jax.devices()[0].platform}

    def save():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    def chained_fwd(net, k, x0):
        """K forwards with a data dependence in one dispatched program."""
        def prog(v, x):
            def body(c, _):
                out = net.apply(v, c, train=False)
                bump = (out[0].mean() * 1e-6).astype(c.dtype)
                return c + bump, None
            c, _ = jax.lax.scan(body, x, None, length=k)
            return c
        jitted = jax.jit(prog)
        carry = {"x": x0}

        def call(v):
            carry["x"] = jitted(v, carry["x"])
            return carry["x"]
        return call

    def chained_step(cfg_s, cfg_tt, net, tn, distill, tv, consts, pool1,
                     k=KS):
        opt = make_optimizer(cfg_s)
        multi = jax.jit(
            build_multi_step(cfg_s, cfg_tt, consts, net, tn, opt,
                             distill=distill, pool_size=1),
            donate_argnums=(0,), static_argnums=(5,))
        carry = {"s": create_train_state(jax.random.PRNGKey(0), cfg_s, net, opt),
                 "r": jax.random.PRNGKey(2)}

        def call():
            s, r, m = multi(carry["s"], tv, pool1, carry["r"],
                            jnp.zeros((), jnp.int32), k)
            carry["s"], carry["r"] = s, r
            return m["loss_total"]
        return call

    mfu = lambda f, t: round(100 * f / t / V5E_BF16_PEAK, 2)

    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h", input_res=res,
                                   compute_dtype="bfloat16"))
    n_fg = cfg.data.n_fg
    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=res, max_objs=8,
                              single_class=0, seed=0)
    consts = ds.consts()

    cfg_tu = Config(model=ModelConfig(backbone="darknet53", input_res=res,
                                      compute_dtype="bfloat16"))
    cfg_tf = cfg_tu.replace(model=dataclasses.replace(
        cfg_tu.model, bn_folded=True))
    tnet_u = PoseNet(cfg=cfg_tu.model, n_fg=n_fg)
    tnet_f = PoseNet(cfg=cfg_tf.model, n_fg=n_fg)
    tvars_u = tnet_u.init(jax.random.PRNGKey(1), jnp.zeros((1, res, res, 3)))
    tvars_f = jax.device_put(fold_batchnorm(jax.device_get(tvars_u)))
    tvars_u = jax.device_put(tvars_u)

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)

    for bs in args.batches:
        batch = jax.device_put(ds.batch(range(bs), train=True))
        pool1 = jax.tree_util.tree_map(lambda x: x[None], batch)
        r = {}

        t_u = timeit(chained_fwd(tnet_u, K, batch.images), tvars_u) / K
        t_f = timeit(chained_fwd(tnet_f, K, batch.images), tvars_f) / K
        f_t = flops_of(jax.jit(lambda v, x: tnet_f.apply(v, x, train=False)),
                       tvars_f, batch.images)
        r["teacher_fwd_ms"] = {"unfolded": round(1e3 * t_u, 3),
                               "folded": round(1e3 * t_f, 3),
                               "speedup": round(t_u / t_f, 3),
                               "folded_mfu_pct": mfu(f_t, t_f)}

        t_kd_u = timeit(chained_step(cfg, cfg_tu, net, tnet_u, True, tvars_u,
                                     consts, pool1)) / KS
        t_kd_f = timeit(chained_step(cfg, cfg_tf, net, tnet_f, True, tvars_f,
                                     consts, pool1)) / KS
        opt = make_optimizer(cfg)
        from kd6d_pose_adlp_tpu.engine.steps import build_train_step
        st = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
        f_kd = flops_of(jax.jit(build_train_step(
            cfg, cfg_tf, consts, net, tnet_f, opt, distill=True)),
            st, tvars_f, batch, jax.random.PRNGKey(2))
        r["kd_step"] = {"unfolded_ms": round(1e3 * t_kd_u, 3),
                        "folded_ms": round(1e3 * t_kd_f, 3),
                        "speedup": round(t_kd_u / t_kd_f, 3),
                        "folded_img_s": round(bs / t_kd_f, 1),
                        "folded_mfu_pct": mfu(f_kd, t_kd_f)}

        r["variants"] = {}
        for bb in ("darknet_tiny_h", "darknet_tiny_h_wide",
                   "darknet_tiny_h_s2d"):
            cfg_v = Config(model=ModelConfig(backbone=bb, input_res=res,
                                             compute_dtype="bfloat16"))
            net_v = PoseNet(cfg=cfg_v.model, n_fg=n_fg)
            sv = net_v.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, res, res, 3)))
            t_fwd = timeit(chained_fwd(net_v, K, batch.images), sv) / K
            t_step = timeit(chained_step(cfg_v, None, net_v, None, False,
                                         None, consts, pool1)) / KS
            f_fwd = flops_of(jax.jit(
                lambda v, x, n_=net_v: n_.apply(v, x, train=False)),
                sv, batch.images)
            r["variants"][bb] = {
                "fwd_ms": round(1e3 * t_fwd, 3),
                "fwd_mfu_pct": mfu(f_fwd, t_fwd),
                "base_step_ms": round(1e3 * t_step, 3),
                "base_step_img_s": round(bs / t_step, 1)}
        results[f"bs{bs}"] = r
        print(json.dumps({f"bs{bs}": r}), flush=True)
        save()

    if args.train_ab:
        import copy

        import train_synthetic_tpu as tst
        base_ns = tst.build_parser().parse_args([])
        base_ns.steps = args.ab_steps
        base_ns.eval_n = 128
        if args.cpu_smoke:
            base_ns.cpu = True
            base_ns.input_res = res
            base_ns.batch_size = 2
            base_ns.batches = 2
            base_ns.eval_n = 4
        cache = {}
        for bb in ("darknet_tiny_h", "darknet_tiny_h_wide",
                   "darknet_tiny_h_s2d"):
            ns = copy.copy(base_ns)
            ns.backbone = bb
            ns.working_dir = f"outputs/perf_ab/{bb}/"
            ns._pool_cache = cache
            out = tst.run(ns)
            results[f"ab_{bb}"] = out
            print(json.dumps({f"ab_{bb}": out}), flush=True)
            save()
    print("PERF-SUITE-DONE", flush=True)


if __name__ == "__main__":
    main()
