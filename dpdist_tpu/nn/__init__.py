from dpdist_tpu.nn.layers import (
    dense_init,
    dense_apply,
    conv3d_init,
    conv3d_apply,
    batchnorm_init,
    batchnorm_apply,
    dropout,
    mlp_init,
    mlp_apply,
)
from dpdist_tpu.nn.schedules import staircase_lr, bn_momentum_schedule

__all__ = [
    "dense_init",
    "dense_apply",
    "conv3d_init",
    "conv3d_apply",
    "batchnorm_init",
    "batchnorm_apply",
    "dropout",
    "mlp_init",
    "mlp_apply",
    "staircase_lr",
    "bn_momentum_schedule",
]
