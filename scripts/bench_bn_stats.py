"""BN-statistics dtype A/B (VERDICT r4 next #5a).

The round-3/4 KD-step profile attributes ~2.3 ms of the 15.5 ms device
step to bf16->f32 convert+reduce around BatchNorm statistics
(BASELINE.md "Component profile"). flax already avoids materializing an
f32 copy of the feature maps (force_float32_reductions accumulates the
reductions in f32); the only remaining lever at the JAX level is
accumulating the statistics in bf16 outright. This measures that:

  arm f32 (production): force_float32_reductions=True
  arm bf16 (probe)    : force_float32_reductions=False

for the full KD train step (tiny_h student + folded darknet53 teacher,
bs16/256² — the headline config), scan-chained K steps per dispatch so
the tunnel RTT and any replay layer can't distort it. Also runs a
200-step training-equivalence probe (same data/seed, final loss delta)
because bf16-accumulated means over ~1M-element maps lose mantissa.

Run (chip):  python scripts/bench_bn_stats.py
CPU smoke:   python scripts/bench_bn_stats.py --cpu --steps 2 --train_steps 4
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--input_res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8,
                    help="scanned steps per dispatch for the timing arm")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--train_steps", type=int, default=200,
                    help="training-equivalence probe length")
    ap.add_argument("--out", type=str, default="results/bn_stats_ab.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu or os.environ.get("KD6D_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from kd6d_pose_adlp_tpu.config import Config, KDConfig, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.steps import (build_multi_step,
                                                 create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.models import blocks
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()

    dtype = "float32" if args.cpu else "bfloat16"
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h",
                                   compute_dtype=dtype,
                                   input_res=args.input_res),
                 kd=KDConfig(weight=5.0))
    cfg_t = cfg.replace(model=ModelConfig(backbone="darknet53",
                                          compute_dtype=dtype,
                                          input_res=args.input_res,
                                          bn_folded=True))

    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=args.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts()
    batch = ds.batch(range(args.batch_size), train=True)
    pool = jax.device_put(jax.tree_util.tree_map(
        lambda x: np.asarray(x)[None], batch))

    res = {"platform": jax.devices()[0].platform,
           "batch_size": args.batch_size, "input_res": args.input_res}
    try:
        _run_arms(args, res, jax, jnp, np, blocks, cfg, cfg_t, consts, pool,
                  PoseNet, dataclasses, fold_batchnorm, build_multi_step,
                  create_train_state, make_optimizer)
    finally:
        # a mid-arm failure must not leave the probe dtype active for later
        # phases sharing this process (the r5b chain runs bench.py after us)
        blocks.BN_F32_STATS = True
    res["speedup_bf16_stats"] = round(
        res["f32_step_ms"] / max(res["bf16_step_ms"], 1e-9), 4)
    res["loss_delta"] = round(
        res["bf16_final_loss"] - res["f32_final_loss"], 4)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


def _run_arms(args, res, jax, jnp, np, blocks, cfg, cfg_t, consts, pool,
              PoseNet, dataclasses, fold_batchnorm, build_multi_step,
              create_train_state, make_optimizer):
    import time
    for tag, f32_stats in (("f32", True), ("bf16", False)):
        blocks.BN_F32_STATS = f32_stats
        net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
        t_net_src = PoseNet(cfg=dataclasses.replace(cfg_t.model,
                                                    bn_folded=False),
                            n_fg=cfg.data.n_fg)
        t_vars = t_net_src.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, args.input_res, args.input_res, 3)))
        t_vars = jax.device_put(fold_batchnorm(t_vars))
        teacher_net = PoseNet(cfg=cfg_t.model, n_fg=cfg.data.n_fg)
        opt = make_optimizer(cfg)
        state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
        multi = jax.jit(build_multi_step(cfg, cfg_t, consts, net, teacher_net,
                                         opt, distill=True, pool_size=1),
                        donate_argnums=(0,), static_argnums=(5,))
        rng = jax.random.PRNGKey(2)
        mstate, mrng, m = multi(state, t_vars, pool, rng,
                                jnp.zeros((), jnp.int32), args.steps)
        jax.block_until_ready(m["loss_total"])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            mstate, mrng, m = multi(mstate, t_vars, pool, mrng,
                                    jnp.zeros((), jnp.int32), args.steps)
        jax.block_until_ready(m["loss_total"])
        dt = time.perf_counter() - t0
        ips = args.batch_size * args.steps * args.reps / dt
        res[f"{tag}_step_ms"] = round(1e3 * dt / (args.steps * args.reps), 3)
        res[f"{tag}_img_s"] = round(ips, 1)
        print(f"{tag}: {res[f'{tag}_step_ms']} ms/step = {ips:.1f} img/s",
              flush=True)

        # training-equivalence probe: K more dispatches, record the loss
        losses = []
        k = max(1, args.train_steps // max(args.steps, 1))
        for _ in range(k):
            mstate, mrng, m = multi(mstate, t_vars, pool, mrng,
                                    jnp.zeros((), jnp.int32), args.steps)
            losses.append(float(jax.device_get(m["loss_total"])))
        res[f"{tag}_final_loss"] = round(losses[-1], 4)
        res[f"{tag}_loss_tail"] = [round(v, 4) for v in losses[-4:]]


if __name__ == "__main__":
    main()
