"""Loss functions (reference: dpdist_util.get_loss:962-980, tf_util_loss)."""

from __future__ import annotations

import jax.numpy as jnp

from dpdist_tpu.ops.chamfer import chamfer_distance
from dpdist_tpu.ops.emd import earth_mover_distance


def l1_sample_loss(pred_AB, labels_AB):
    """L1 between channel-0 predictions and GT point-to-surface distances.

    The training loss for DPDist itself ('loss_samples',
    dpdist_util.py:965-974). pred_AB: (B, N, C); labels_AB: (B, N).
    """
    return jnp.mean(jnp.abs(pred_AB[..., 0] - labels_AB))


def pred_mean_loss(pred_AB, pred_BA):
    """'loss_pred': the symmetric mean prediction (dpdist_util.py:976-979)."""
    return (jnp.mean(pred_AB[..., 0]) + jnp.mean(pred_BA[..., 0])) / 2.0


def chamfer_loss(pc1, pc2, *, sqrt: bool = True):
    return chamfer_distance(pc1, pc2, sqrt=sqrt)


def emd_loss(pc1, pc2, *, iters: int = 50):
    return earth_mover_distance(pc1, pc2, iters=iters)
