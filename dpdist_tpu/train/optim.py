"""Optimizer construction (optax) with the reference's schedules.

Reference: Adam with staircase exponential LR decay floored at 1e-7
(train_multi_gpu_pc_compare_dist.py:301-302, 976-990), or momentum SGD.
Weight decay (when set) is additive L2 on matmul kernels only, matching
tf_util's weight-decay collection applied to conv/fc weights, not biases
(utils/tf_util.py:73-98).
"""

from __future__ import annotations

import jax
import optax

from dpdist_tpu.configs import TrainConfig
from dpdist_tpu.nn.schedules import staircase_lr


def make_optimizer(cfg: TrainConfig, *, base_lr: float | None = None):
    lr = staircase_lr(
        base_lr if base_lr is not None else cfg.learning_rate,
        cfg.decay_step, cfg.decay_rate, cfg.lr_floor,
    )
    if cfg.optimizer == "adam":
        opt = optax.adam(lr)
    elif cfg.optimizer == "momentum":
        opt = optax.sgd(lr, momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    if getattr(cfg, "grad_clip", 0.0) > 0:
        # Global-norm clipping BEFORE Adam: the full-BPTT train_single
        # loss backprops through an 8-iteration unrolled refinement whose
        # gradients occasionally explode late in training (round-3
        # collapse, RESULTS.md multifam ts1200); clipping bounds the
        # update without touching the steady-state scale.
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)

    if cfg.weight_decay > 0:
        def kernel_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: any(getattr(k, "key", None) == "w" for k in path),
                params,
            )

        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=kernel_mask), opt
        )
    return opt
