"""Frozen DPDist as a differentiable loss — functional composition.

The reference's signature architectural move is TF1 meta-graph splicing:
a trained DPDist checkpoint is imported into a new graph with input_map
so its output becomes a frozen, differentiable loss
(train_multi_gpu_pc_compare_dist.py:427-439, iterative_PCRNet_ours.py:229-234).

In JAX this collapses to closing a pure function over a restored param
pytree: gradients flow through the frozen network into the *inputs*
(reconstructions / transformed sources), while stop_gradient on the params
guarantees they never update — the exact semantics of the reference's
"optimize only scope g2 / Network vars" trick, without graph surgery.
"""

from __future__ import annotations

import jax

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.models.dpdist import dpdist_distance, resolve_for_grad


def make_frozen_dpdist_loss(params, state, cfg: DPDistConfig,
                            *, out_of_grid_penalty: float = 1.0):
    """Return loss_fn(pcA, pcB) -> scalar, closed over frozen params.

    The returned function is jit/grad/vmap-compatible and runs the DPDist
    network in inference mode (is_training=False, matching the reference's
    spliced-graph behavior).

    out_of_grid_penalty: DPDist zeroes predictions for query points
    outside the [-1, 1] grid (dpdist_util.py:695-698) — which makes
    "push the cloud out of the grid" a degenerate global minimum when the
    distance is used as a training loss (observed: PCRNet translations
    diverge while the loss plateaus). The same hazard exists in the
    reference formulation; this barrier term
    penalty * mean(relu(|x| - 1)) over both clouds keeps optimization
    inside the valid domain without affecting in-grid gradients. Set 0 to
    reproduce the raw reference semantics.
    """
    # A frozen loss exists to be differentiated (wrt the clouds): resolve
    # the 'auto' kernel dispatch for the grad context (the fused-forward
    # 'mfv' kernel loses 1.37x on the src-grad path — see
    # models/dpdist.resolve_for_grad).
    cfg = resolve_for_grad(cfg)

    def loss_fn(pcA, pcB):
        # stop_gradient inside the traced function so params stay frozen
        # even when loss_fn is differentiated jointly with its closure.
        frozen_params = jax.lax.stop_gradient(params)
        frozen_state = jax.lax.stop_gradient(state)
        d = dpdist_distance(frozen_params, frozen_state, cfg, pcA, pcB)
        if out_of_grid_penalty > 0:
            import jax.numpy as jnp

            def barrier(pc):
                return jnp.mean(jax.nn.relu(jnp.abs(pc) - 1.0))

            d = d + out_of_grid_penalty * (barrier(pcA) + barrier(pcB))
        return d

    return loss_fn
