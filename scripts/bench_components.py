"""Component-level throughput probe on the real chip (profiling aid).

Times, separately: student inference forward, teacher forward, full KD train
step, and the device postprocess (voting + RANSAC-EPnP), at the reference
batch and at a larger batch to show MXU-utilization headroom.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
    from kd6d_pose_adlp_tpu.engine.steps import (build_train_step,
                                                 create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    results = {}
    for bs in (16, 64):
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
        step = jax.jit(build_train_step(cfg, cfg_t, consts, net, tnet, opt,
                                        distill=True))
        post = build_postprocess(cfg, consts)

        t_fs = timeit(fwd_s, svars, batch.images)
        t_ft = timeit(fwd_t, tvars, batch.images)
        t_step = timeit(lambda s, b, r: step(s, tvars, b, r),
                        state, batch, jax.random.PRNGKey(2))
        cls, reg = fwd_s(svars, batch.images)
        t_post = timeit(lambda c, g, b, r: post(c, g, b, r),
                        cls, reg, batch, jax.random.PRNGKey(3))
        results[f"bs{bs}"] = {
            "student_fwd_img_s": round(bs / t_fs, 1),
            "teacher_fwd_img_s": round(bs / t_ft, 1),
            "kd_step_img_s": round(bs / t_step, 1),
            "postprocess_img_s": round(bs / t_post, 1),
            "step_ms": round(1e3 * t_step, 2),
        }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
