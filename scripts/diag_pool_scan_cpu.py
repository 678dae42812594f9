"""Diagnostic: host loop vs pool-scan over 300 steps on CPU (res 64).

Prints the reg/cls losses every 50 steps for both paths from identical
seeds/pools; a training-dynamics bug in the scan path would show as
trajectory divergence well before 300 steps.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import itertools

import numpy as np

from kd6d_pose_adlp_tpu.config import (Config, KDConfig, ModelConfig,
                                       SolverConfig)
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.loop import train

STEPS = 300

cfg = Config(
    model=ModelConfig(backbone="darknet_tiny_h", input_res=64),
    solver=SolverConfig(ims_per_batch=4, max_iter=STEPS, val_freq=STEPS,
                        max_objs=2, max_pos=32, seed=0),
    kd=KDConfig(weight=0.0),
)
ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=64, max_objs=2,
                          single_class=0, seed=0)
pool = [ds.batch(range(b * 4, (b + 1) * 4), train=True) for b in range(8)]
stacked = jax.tree_util.tree_map(
    lambda *xs: np.stack([np.asarray(x) for x in xs]), *pool)
consts = ds.consts()

print("== host loop ==", flush=True)
st_h = train(cfg, consts, itertools.cycle(pool), working_dir="/tmp/diag_host",
             resume=False, log_every=5, verbose=True)
print("== pool scan k=50 ==", flush=True)
st_p = train(cfg, consts, None, pool=jax.device_put(stacked),
             steps_per_dispatch=50, working_dir="/tmp/diag_pool",
             resume=False, log_every=5, verbose=True)

ph = jax.tree_util.tree_leaves(st_h.params)
pp = jax.tree_util.tree_leaves(st_p.params)
d = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(ph, pp))
print(f"max param |diff| after {STEPS} steps: {d:.2e}")
