"""Training-loop driver: artifacts, checkpointing, resume."""
import pytest
import itertools
import os

import jax
import numpy as np

from kd6d_pose_adlp_tpu.config import Config, KDConfig, ModelConfig, SolverConfig, TestConfig
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.loop import train

RES, N_FG = 64, 3


def _cfg(max_iter):
    return Config(
        model=ModelConfig(backbone="darknet_tiny_h", input_res=RES),
        solver=SolverConfig(ims_per_batch=2, max_iter=max_iter, val_freq=max_iter,
                            max_objs=2, max_pos=32),
        test=TestConfig(max_votes=16, ransac_iters=8),
        kd=KDConfig(weight=0.0),
    )


@pytest.mark.slow
def test_loop_artifacts_and_resume(tmp_path):
    ds = SyntheticPoseDataset(n_fg=N_FG, input_res=RES, max_objs=2,
                              single_class=1, seed=11)
    consts = ds.consts()
    consts = consts._replace(kp3d=consts.kp3d[:N_FG],
                             diameters=consts.diameters[:N_FG])
    pool = [ds.batch(range(b * 2, b * 2 + 2), train=True) for b in range(2)]
    wd = str(tmp_path / "run")

    evals = []
    state = train(_cfg(3), consts, itertools.cycle(pool),
                  eval_fn=lambda s, step: evals.append(step),
                  working_dir=wd, verbose=False)
    assert int(jax.device_get(state.step)) == 3
    assert evals == [3]
    for f in ("latest.ckpt", "final.ckpt", "cfg.json", "info.txt", "scalars.jsonl"):
        assert os.path.exists(os.path.join(wd, f)), f

    # resume: extend the schedule; must pick up at step 3 and run to 5
    state2 = train(_cfg(5), consts, itertools.cycle(pool),
                   working_dir=wd, verbose=False)
    assert int(jax.device_get(state2.step)) == 5
    # the resumed run continued from the trained params, not a re-init
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert p1.shape == p2.shape
    assert not np.allclose(np.asarray(p1), np.asarray(p2))  # 2 more steps applied
