"""Optimizer schedules.

OneCycle with linear annealing, matching torch.optim.lr_scheduler.OneCycleLR
(anneal_strategy='linear', three_phase=False) as configured by the reference
(`libs/train_libs.py:120`): warm up from max_lr/div_factor to max_lr over
pct_start of total steps, then anneal linearly to max_lr/div_factor/final_div.

NOTE: the reference passes cycle_momentum=False, so Adam beta1 stays at 0.9
throughout training; `onecycle_linear_beta1` below models torch's
cycle_momentum=True variant and is provided for experimentation only.
"""
from __future__ import annotations

import jax.numpy as jnp


def onecycle_linear_lr(max_lr: float, total_steps: int, pct_start: float = 0.05,
                       div_factor: float = 25.0, final_div_factor: float = 1e4):
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up = max(int(pct_start * total_steps) - 1, 1)
    down = max(total_steps - up - 1, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr_up = initial + (max_lr - initial) * jnp.clip(step / up, 0, 1)
        lr_down = max_lr + (final - max_lr) * jnp.clip((step - up) / down, 0, 1)
        return jnp.where(step <= up, lr_up, lr_down)

    return schedule


def onecycle_linear_beta1(total_steps: int, pct_start: float = 0.05,
                          max_momentum: float = 0.95, base_momentum: float = 0.85):
    up = max(int(pct_start * total_steps) - 1, 1)
    down = max(total_steps - up - 1, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        m_up = max_momentum + (base_momentum - max_momentum) * jnp.clip(step / up, 0, 1)
        m_down = base_momentum + (max_momentum - base_momentum) * jnp.clip((step - up) / down, 0, 1)
        return jnp.where(step <= up, m_up, m_down)

    return schedule
