from dpdist_tpu.losses.standard import (
    l1_sample_loss,
    pred_mean_loss,
    chamfer_loss,
    emd_loss,
)
from dpdist_tpu.losses.dpdist_loss import make_frozen_dpdist_loss

__all__ = [
    "l1_sample_loss",
    "pred_mean_loss",
    "chamfer_loss",
    "emd_loss",
    "make_frozen_dpdist_loss",
]
