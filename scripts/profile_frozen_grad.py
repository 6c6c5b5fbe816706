#!/usr/bin/env python3
"""Stage breakdown of the frozen-DPDist input-gradient path (VERDICT r3
next-#4): where does the 3.4x-of-forward go?

The downstream hot path (PCRNet/AUE training, iterative_PCRNet_ours.py:
255-257 semantics) backprops through the frozen net into the CLOUDS.
Bench's round-3 number (7.7k pairs/s) differentiated wrt BOTH clouds —
but in actual PCRNet training the template is a constant, so its 3DmFV
backward is dead. This script times:

  loss_fwd            frozen loss, value only (bidirectional)
  grad_both           d loss / d (pcA, pcB)       [bench r3's number]
  grad_src_only       d loss(src, template)/d src [the real hot path]
  mfv_vjp             3DmFV fwd+bwd wrt points, one cloud
  tabledec_vjp        gather+decode fwd + bwd wrt (fv, queries)
  dec_input_vjp       decoder MLP fwd + input-grad only

One JSON line per stage. Timing needs an idle chip for absolute numbers;
relative stage shares are stable under chip sharing (stages serialize
on-chip).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.losses import make_frozen_dpdist_loss
from dpdist_tpu.models import init_dpdist
from dpdist_tpu.models.dpdist import _decoder_inputs_table_vmem, _fused_gather_mode
from dpdist_tpu.nn.layers import mlp_apply
from dpdist_tpu.ops.threedmfv import threedmfv


def t_ms(fn, iters=30):
    np.asarray(jax.tree_util.tree_leaves(fn())[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    B = 256
    for dtype in ("float32", "bfloat16"):
        cfg = DPDistConfig(dtype=dtype)
        N = cfg.num_point
        params, state = init_dpdist(jax.random.PRNGKey(0), cfg)
        loss = make_frozen_dpdist_loss(params, state, cfg)
        rng = np.random.default_rng(0)
        pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (B, N, 3)).astype(np.float32))
        pcB = jnp.asarray(rng.uniform(-0.8, 0.8, (B, N, 3)).astype(np.float32))

        fwd = jax.jit(loss)
        g_both = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        # The PCRNet shape: template closed over as a constant; only the
        # (transformed) source takes a gradient.
        g_src = jax.jit(jax.value_and_grad(lambda s: loss(s, pcB)))

        stages = {
            "loss_fwd": lambda: fwd(pcA, pcB),
            "grad_both": lambda: g_both(pcA, pcB),
            "grad_src_only": lambda: g_src(pcA),
        }

        if dtype == "float32":
            # component VJPs (f32 only: isolating where the 3.4x goes)
            mfv = jax.jit(jax.value_and_grad(
                lambda p: jnp.sum(threedmfv(p, cfg.embedding_size, cfg.sigma,
                                            full_fv=cfg.full_fv))))
            fvA = threedmfv(pcA, cfg.embedding_size, cfg.sigma,
                            full_fv=cfg.full_fv).astype(cfg.dtype)

            def tabledec(fv, q):
                x, mask = _decoder_inputs_table_vmem(cfg, q, fv)
                y, _ = mlp_apply(params["decoder"], {}, x, train=False)
                return jnp.sum(y * mask[..., None])

            td = jax.jit(jax.value_and_grad(tabledec, argnums=(0, 1)))

            xin = jnp.asarray(rng.normal(0, 0.1, (2 * B, N, cfg.patch_dim + 3))
                              .astype(np.float32))

            def dec(xx):
                frozen = jax.lax.stop_gradient(params["decoder"])
                y, _ = mlp_apply(frozen, {}, xx, train=False)
                return jnp.sum(y)

            di = jax.jit(jax.value_and_grad(dec))

            stages.update({
                "mfv_vjp": lambda: mfv(pcA),
                "tabledec_vjp": lambda: td(fvA, pcB),
                "dec_input_vjp": lambda: di(xin),
            })

        for name, fn in stages.items():
            ms = t_ms(fn)
            print(json.dumps({"stage": name, "dtype": dtype,
                              "ms": round(ms, 3),
                              "pairs_per_sec": round(B * 1000 / ms, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
