#!/usr/bin/env python3
"""Component breakdown of the DPDist forward at the canonical config.

Times each stage in isolation on the live device (B=256, np=64):
3DmFV encode (XLA vs Pallas), patch path (XLA table vs VMEM-table
kernel), decoder MLP, and the assembled full forward — the evidence for
bench.py's headline and the roofline story in RESULTS.md. Run when the
chip is otherwise idle; one JSON line per stage.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.models import init_dpdist, apply_dpdist
from dpdist_tpu.ops.threedmfv import threedmfv
from dpdist_tpu.ops.voxel import voxel_assign, extract_patches, gather_patches
from dpdist_tpu.kernels.threedmfv_pallas import threedmfv_pallas
from dpdist_tpu.kernels.table_gather_pallas import table_gather
from dpdist_tpu.nn.layers import mlp_apply


def t_ms(fn, iters=30):
    np.asarray(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    cfg = DPDistConfig()
    B, N = 256, cfg.num_point
    params, state = init_dpdist(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (B, N, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-0.8, 0.8, (B, N, 3)).astype(np.float32))

    fv = threedmfv(pcA, impl="xla")
    vox, mask, delta = voxel_assign(pcB, cfg.grid_size)
    x = jnp.asarray(
        rng.normal(0, 0.1, (2 * B, N, cfg.patch_dim + 3)).astype(np.float32))

    # Every stage returns a SCALAR (sum) so the timing is device compute,
    # not the relay fetch of a multi-hundred-MB intermediate.
    stages = {
        "threedmfv_xla": jax.jit(
            lambda p: jnp.sum(threedmfv(p, impl="xla"))),
        "threedmfv_pallas": jax.jit(
            lambda p: jnp.sum(threedmfv_pallas(p))),
        "patch_xla_table": jax.jit(
            lambda f, v: jnp.sum(gather_patches(
                extract_patches(f, cfg.grid_size, cfg.k), v, None))),
        "patch_vmem_kernel": jax.jit(
            lambda f, v: jnp.sum(table_gather(f, v, cfg.grid_size, cfg.k))),
        "decoder_mlp": jax.jit(
            lambda xx: jnp.sum(
                mlp_apply(params["decoder"], {}, xx, train=False)[0])),
    }
    args = {
        "threedmfv_xla": (pcA,),
        "threedmfv_pallas": (pcA,),
        "patch_xla_table": (fv, vox),
        "patch_vmem_kernel": (fv, vox),
        "decoder_mlp": (x,),
    }
    for name, fn in stages.items():
        ms = t_ms(lambda fn=fn, a=args[name]: fn(*a))
        print(json.dumps({"stage": name, "ms": round(ms, 3)}), flush=True)

    # r5: the fused points->x kernel as a stage (both directions, 2B grid)
    from dpdist_tpu.kernels.mfv_gather_pallas import mfv_table_gather_x

    pts2 = jnp.concatenate([pcA, pcB], axis=0)
    q2 = jnp.concatenate([pcB, pcA], axis=0)
    f_mfvk = jax.jit(lambda p, q: jnp.sum(mfv_table_gather_x(
        p, q, cfg.embedding_size, cfg.sigma, cfg.grid_size, cfg.k)))
    ms = t_ms(lambda: f_mfvk(pts2, q2))
    print(json.dumps({"stage": "mfv_x_kernel_2B", "ms": round(ms, 3)}),
          flush=True)

    for label, c in (("full_forward_f32", cfg),
                     ("full_forward_bf16", DPDistConfig(dtype="bfloat16")),
                     ("full_forward_f32_table",
                      DPDistConfig(fused_gather="table")),
                     ("full_forward_bf16_table",
                      DPDistConfig(dtype="bfloat16", fused_gather="table"))):
        # consume both directions so neither dead-code-eliminates
        f = jax.jit(lambda a, b, c=c: sum(
            jnp.sum(o) for o in apply_dpdist(params, state, c, a, b,
                                             train=False)[:2]))
        ms = t_ms(lambda: f(pcA, pcB))
        print(json.dumps({"stage": label, "ms": round(ms, 3),
                          "pairs_per_sec": round(B * 1000 / ms, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
