import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.engine.schedule import onecycle_linear_beta1, onecycle_linear_lr
from kd6d_pose_adlp_tpu.utils import checkpoint as ckpt


def test_onecycle_lr_matches_torch():
    torch = pytest.importorskip("torch")
    total = 1000
    max_lr = 1e-3
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total, pct_start=0.05,
        anneal_strategy="linear")
    ours = onecycle_linear_lr(max_lr, total)
    torch_lrs, our_lrs = [], []
    for step in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(float(ours(step)))
        opt.step()
        sched.step()
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-9)


def test_onecycle_beta1_matches_torch():
    torch = pytest.importorskip("torch")
    total = 500
    # the reference itself disables momentum cycling (cycle_momentum=False,
    # libs/train_libs.py:120); our beta1 schedule models torch's
    # cycle_momentum=True variant, checked here against torch
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=1e-3)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-3, total_steps=total, pct_start=0.05,
        anneal_strategy="linear", cycle_momentum=True)
    ours = onecycle_linear_beta1(total)
    for step in range(total):
        torch_b1 = opt.param_groups[0]["betas"][0]
        np.testing.assert_allclose(float(ours(step)), torch_b1, rtol=1e-5)
        opt.step()
        sched.step()


def test_checkpoint_roundtrip(tmp_path):
    state = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
             "b": {"c": jnp.ones((4,))}}
    path = str(tmp_path / "latest.ckpt")
    ckpt.save_checkpoint(path, state, step=42)
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, step = ckpt.restore_checkpoint(path, template)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(state["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), 1.0)


def test_loose_params_restore(tmp_path):
    params = {"layer1": {"kernel": jnp.ones((3, 3))},
              "layer2": {"kernel": jnp.full((2, 2), 2.0)}}
    path = str(tmp_path / "final.ckpt")
    ckpt.save_params(path, params)
    # template with an extra layer and a shape mismatch
    template = {"layer1": {"kernel": jnp.zeros((3, 3))},
                "layer2": {"kernel": jnp.zeros((5, 5))},   # mismatched: skipped
                "layer3": {"kernel": jnp.zeros((1,))}}      # missing: kept
    out, n = ckpt.load_params_loose(path, template)
    assert n == 1
    np.testing.assert_array_equal(np.asarray(out["layer1"]["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["layer2"]["kernel"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["layer3"]["kernel"]), 0.0)


def test_checkpoint_config_hash_guard(tmp_path):
    """Resuming under a different architecture-relevant config must raise;
    schedule-only changes (max_iter) must stay legal (VERDICT r1 weak 7)."""
    import dataclasses

    import pytest

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.utils.checkpoint import (config_hash,
                                                     restore_checkpoint,
                                                     save_checkpoint)

    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h", input_res=64))
    state = {"w": np.zeros((2, 2), np.float32)}
    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, state, 7, cfg_hash=config_hash(cfg))

    # same config: fine
    out, step = restore_checkpoint(path, state, cfg_hash=config_hash(cfg))
    assert step == 7

    # schedule change: hash identical by design
    cfg_longer = cfg.replace(solver=dataclasses.replace(
        cfg.solver, max_iter=99999))
    assert config_hash(cfg_longer) == config_hash(cfg)

    # architecture change: refused
    cfg_other = cfg.replace(model=dataclasses.replace(
        cfg.model, backbone="darknet_tiny"))
    with pytest.raises(ValueError, match="different config"):
        restore_checkpoint(path, state, cfg_hash=config_hash(cfg_other))

    # legacy checkpoint without a hash: accepted
    save_checkpoint(path, state, 3)
    _, step = restore_checkpoint(path, state, cfg_hash=config_hash(cfg))
    assert step == 3
