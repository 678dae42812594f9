"""Serving-artifact benchmark: exported StableHLO endpoint vs in-process jit.

Measures, per batch size, the full inference endpoint (uint8 image ->
forward -> voting -> RANSAC-EPnP -> LHM poses):
  - in-process `build_infer_fn` under jit (the test.py path)
  - the deserialized `jax.export` artifact (the deployment path)
Replay-immunity through the tunnel: every timed call uses a fresh seed, so
the (executable, args) pair never repeats and nothing replays from the
dispatch cache (see scripts/bench_components.timeit notes).

Note: each timed call is ONE dispatch, so the absolute numbers include the
per-dispatch link RTT (~30 ms through this box's remote tunnel) — an upper
bound on real TPU-local serving latency, but identical for both paths, so
`artifact_vs_in_process` is a clean overhead ratio and the bs-64 row is
compute-dominated either way.

Run: python scripts/bench_serving.py [--cpu_smoke]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weight_file", type=str,
                    default="outputs/ab/baseline_s1/final.ckpt")
    ap.add_argument("--backbone", type=str, default="darknet_tiny_h")
    ap.add_argument("--input_res", type=int, default=256)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 64])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", type=str, default="results/bench_serving.json")
    ap.add_argument("--cpu_smoke", action="store_true")
    args = ap.parse_args()

    import jax
    from kd6d_pose_adlp_tpu.utils.jaxcache import setup_compilation_cache
    setup_compilation_cache()
    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        args.input_res = 128
        args.batches = [2]
        args.iters = 2
        args.out = "results/bench_serving_cpu_smoke.json"
    import dataclasses

    import jax.numpy as jnp

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.serving import (build_infer_fn,
                                                   centered_bbox_trans,
                                                   export_inference,
                                                   load_serving)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_params_loose

    dtype = "float32" if args.cpu_smoke else "bfloat16"
    cfg = Config(model=ModelConfig(backbone=args.backbone,
                                   input_res=args.input_res,
                                   compute_dtype=dtype))
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=args.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, mesh_diameters=tuple(np.asarray(consts.diameters))))

    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    init = net.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, args.input_res, args.input_res, 3)))
    if os.path.exists(args.weight_file):
        variables, n = load_params_loose(args.weight_file, init)
        print(f"loaded {n} tensors", flush=True)
    else:  # throughput doesn't depend on the weights' values
        variables = init
        print(f"{args.weight_file} absent; timing with init weights", flush=True)

    results = {"platform": jax.devices()[0].platform,
               "input_res": args.input_res, "backbone": args.backbone}

    def timeit(call, bs):
        """Median over iters; fresh seed per call defeats tunnel replay."""
        call(0)  # compile/warm
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(call(i + 1))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        return {"ms": round(1e3 * t, 3), "img_s": round(bs / t, 1)}

    rng = np.random.default_rng(0)
    for bs in args.batches:
        images = jnp.asarray(rng.integers(
            0, 256, (bs, args.input_res, args.input_res, 3), dtype=np.uint8))
        bt = jnp.asarray(centered_bbox_trans(bs, args.input_res))
        ids = jnp.zeros((bs,), jnp.int32)

        direct = jax.jit(build_infer_fn(cfg, consts, variables))
        r = {"in_process": timeit(
            lambda s: direct(images, bt, ids, jnp.asarray(s, jnp.uint32)), bs)}

        path = f"/tmp/serving_bench_bs{bs}.hlo"
        t0 = time.time()
        meta = export_inference(cfg, consts, variables, path, batch_size=bs,
                                platforms=(jax.devices()[0].platform,))
        r["export_s"] = round(time.time() - t0, 1)
        r["artifact_mb"] = round(meta["bytes"] / 1e6, 2)
        serve, _ = load_serving(path)
        r["artifact"] = timeit(lambda s: serve(images, bt, ids, seed=s), bs)
        r["artifact_vs_in_process"] = round(
            r["artifact"]["img_s"] / max(r["in_process"]["img_s"], 1e-9), 3)
        results[f"bs{bs}"] = r
        print(json.dumps({f"bs{bs}": r}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("BENCH-SERVING-DONE", flush=True)


if __name__ == "__main__":
    main()
