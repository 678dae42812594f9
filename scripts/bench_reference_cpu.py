"""Same-host reference-vs-ours model benchmark (CPU, single core).

VERDICT r2 weak #5: the bench's `vs_baseline` anchors on a FLOPs-derived
V100 estimate because no V100 exists in this image. This script adds a
MEASURED datum on hardware both frameworks can actually run here: the
reference's own torch modules (imported from /root/reference, eager CPU
float32, their native NCHW) against our Flax PoseNet (XLA-CPU float32,
NHWC), identical batch/resolution, on the same single core.

Measured per model (student darknet_tiny_h, teacher darknet53):
  - eval-mode forward images/sec
  - forward+backward images/sec (scalar sum-of-outputs loss, which
    exercises the full autodiff path without either side's data pipeline
    or loss specifics)

This is a framework/compiler comparison, not a chip comparison — the TPU
numbers live in bench.py / BASELINE.md. Reference entry points:
models/model.py:495-500 (forward), backbone/darknet.py, backbone/darknet53.py.

Run: python scripts/bench_reference_cpu.py [--res 256 --bs 2 --reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def _median_time(fn, reps: int, warmup: int = 1) -> float:
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_torch(res: int, bs: int, reps: int) -> dict:
    import torch
    from test_full_model_parity import _import_reference_model

    torch.set_num_threads(1)  # the box has one core; make it explicit
    mm = _import_reference_model()
    import importlib
    bmod = importlib.import_module("backbone.darknet")
    bmod53 = importlib.import_module("backbone.darknet53")

    from kd6d_pose_adlp_tpu.config import ModelConfig

    out = {}
    n_fg = 15
    x = torch.randn(bs, 3, res, res)

    for name, make in (("student", lambda c: bmod.darknet_tiny_h(pretrained=False)),
                       ("teacher", lambda c: bmod53.darknet53(pretrained=False))):
        cfg = ModelConfig(backbone="darknet_tiny_h" if name == "student"
                          else "darknet53", input_res=res)
        backbone = make(cfg)
        fpn_top = mm.FPNTopP6P7(cfg.feat_channels[-1], cfg.out_channel)
        fpn = mm.FPN(list(cfg.feat_channels), cfg.out_channel, fpn_top)
        head = mm.PoseHead(cfg.out_channel, n_fg + 1, cfg.n_conv, cfg.prior,
                           "POINT")
        mods = (backbone, fpn, head)

        def forward():
            logits, reg = head(fpn(backbone(x)))
            return logits, reg

        for m in mods:
            m.eval()
        with torch.no_grad():
            t_fwd = _median_time(forward, reps)

        for m in mods:
            m.train()

        def train_step():
            for m in mods:
                m.zero_grad(set_to_none=True)
            logits, reg = forward()
            loss = sum(t.float().sum() for t in logits) \
                + sum(t.float().sum() for t in reg)
            loss.backward()
            return loss

        t_bwd = _median_time(train_step, reps)
        out[name] = {"fwd_img_s": round(bs / t_fwd, 3),
                     "fwd_bwd_img_s": round(bs / t_bwd, 3),
                     "fwd_ms": round(1e3 * t_fwd, 1),
                     "fwd_bwd_ms": round(1e3 * t_bwd, 1)}
    return out


def bench_jax(res: int, bs: int, reps: int) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kd6d_pose_adlp_tpu.config import ModelConfig
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    out = {}
    n_fg = 15
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(bs, res, res, 3)).astype(np.float32))

    for name, bb in (("student", "darknet_tiny_h"), ("teacher", "darknet53")):
        # float32 end to end to mirror the torch run (the TPU path is bf16)
        net = PoseNet(cfg=ModelConfig(backbone=bb, input_res=res,
                                      compute_dtype="float32"), n_fg=n_fg)
        variables = net.init(jax.random.PRNGKey(0), x[:1])

        fwd = jax.jit(lambda v, xx: net.apply(v, xx, train=False))

        def forward():
            return jax.block_until_ready(fwd(variables, x))

        t_fwd = _median_time(forward, reps)

        def loss_fn(params, stats, xx):
            (logits, reg), _ = net.apply(
                {"params": params, "batch_stats": stats}, xx,
                train=True, mutable=["batch_stats"])
            return logits.astype(jnp.float32).sum() \
                + reg.astype(jnp.float32).sum()

        grad = jax.jit(jax.grad(loss_fn))

        def train_step():
            return jax.block_until_ready(
                grad(variables["params"], variables.get("batch_stats", {}), x))

        t_bwd = _median_time(train_step, reps)
        out[name] = {"fwd_img_s": round(bs / t_fwd, 3),
                     "fwd_bwd_img_s": round(bs / t_bwd, 3),
                     "fwd_ms": round(1e3 * t_fwd, 1),
                     "fwd_bwd_ms": round(1e3 * t_bwd, 1)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str, default="results/reference_cpu_ab.json")
    args = ap.parse_args()

    results = {"res": args.res, "bs": args.bs, "reps": args.reps,
               "host": "1 CPU core", "torch_mode": "eager f32 NCHW",
               "jax_mode": "XLA-CPU f32 NHWC"}
    results["torch_reference"] = bench_torch(args.res, args.bs, args.reps)
    print(json.dumps({"torch_reference": results["torch_reference"]}),
          flush=True)
    results["jax_ours"] = bench_jax(args.res, args.bs, args.reps)
    print(json.dumps({"jax_ours": results["jax_ours"]}), flush=True)

    for m in ("student", "teacher"):
        results[f"{m}_speedup"] = {
            k: round(results["jax_ours"][m][k] / results["torch_reference"][m][k], 3)
            for k in ("fwd_img_s", "fwd_bwd_img_s")}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: results[k] for k in
                      ("student_speedup", "teacher_speedup")}), flush=True)
    print("REFERENCE-CPU-AB-DONE", flush=True)


if __name__ == "__main__":
    main()
