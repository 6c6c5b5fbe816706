"""Learning-rate and batch-norm schedules.

Parity with the reference's get_learning_rate / get_bn_decay
(train_multi_gpu_pc_compare_dist.py:976-1000).
"""

from __future__ import annotations

import jax.numpy as jnp


def staircase_lr(base_lr: float, decay_step: int, decay_rate: float,
                 floor: float = 1e-7):
    """Staircase exponential decay with a hard floor.

    lr(step) = max(base_lr * decay_rate ** (step // decay_step), floor)
    """

    def schedule(step):
        step = jnp.asarray(step)
        p = jnp.floor(step / decay_step)
        lr = base_lr * jnp.power(decay_rate, p)
        return jnp.maximum(lr, floor)

    return schedule


def bn_momentum_schedule(init_decay: float = 0.5, decay_step: float = 300 * 512,
                         decay_rate: float = 0.5, clip: float = 0.99):
    """BN EMA momentum schedule: min(clip, 1 - init_decay*rate**(step//n))."""

    def schedule(step):
        step = jnp.asarray(step)
        p = jnp.floor(step / decay_step)
        m = init_decay * jnp.power(decay_rate, p)
        return jnp.minimum(clip, 1.0 - m)

    return schedule
