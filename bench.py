"""Throughput benchmark on real hardware.

Measures the headline configuration of the reference (train.sh row 2):
KD training — darknet53 teacher forward + teacher-knowledge voting +
darknet_tiny_h student forward/backward + AdamW — batch 16 at 256x256,
plus pure student inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no throughput (SURVEY §6), so the
baseline is a FLOPs-derived V100 estimate: the compiled step's exact FLOP
count (XLA cost analysis) over V100 fp32 peak 15.7 TFLOP/s at an optimistic
50% MFU (dense ConvNet). Target from BASELINE.md is 5x that estimate;
vs_baseline = ours / (5 * v100_estimate).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_FP32_PEAK = 15.7e12
V100_MFU = 0.5
TARGET_MULTIPLE = 5.0


def main():
    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.steps import (build_train_step,
                                                 create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    batch_size = 16
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h",
                                   compute_dtype="bfloat16"))
    cfg_t = Config(model=ModelConfig(backbone="darknet53",
                                     compute_dtype="bfloat16"))
    n_fg = cfg.data.n_fg

    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=cfg.model.input_res,
                              max_objs=cfg.solver.max_objs, single_class=0, seed=0)
    consts = ds.consts()
    batch = ds.batch(range(batch_size), train=True)
    batch = jax.device_put(batch)

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)
    teacher_net = PoseNet(cfg=cfg_t.model, n_fg=n_fg)
    t_vars = teacher_net.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.model.input_res, cfg.model.input_res, 3)))
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)

    step_fn = jax.jit(build_train_step(cfg, cfg_t, consts, net, teacher_net,
                                       opt, distill=True), donate_argnums=(0,))

    # FLOP count of the compiled step for the V100-derived baseline; the AOT
    # lowering shares the jit cache, so this is the only compilation
    try:
        lowered = step_fn.lower(state, t_vars, batch, jax.random.PRNGKey(2))
        flops_per_step = float(lowered.compile().cost_analysis()["flops"])
    except Exception:
        flops_per_step = float("nan")

    rng = jax.random.PRNGKey(2)
    # warmup / compile
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, t_vars, batch, sub)
    jax.block_until_ready(metrics["loss_total"])

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, t_vars, batch, sub)
    jax.block_until_ready(metrics["loss_total"])
    dt = time.perf_counter() - t0
    ips = batch_size * n_steps / dt

    if np.isfinite(flops_per_step):
        v100_ips = V100_FP32_PEAK * V100_MFU / (flops_per_step / batch_size)
        vs_baseline = ips / (TARGET_MULTIPLE * v100_ips)
    else:
        vs_baseline = float("nan")

    print(json.dumps({
        "metric": "kd_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
