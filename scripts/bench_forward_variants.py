#!/usr/bin/env python3
"""Compare DPDist forward variants on the live device.

Variants: patch path {xla table, VMEM-table kernel} x dtype {f32, bf16},
plus numeric parity of each variant against the xla-f32 reference.
Canonical config, B=256. One JSON line per variant.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.models import init_dpdist, apply_dpdist


def main():
    batch = 256
    variants = {
        "xla_f32": DPDistConfig(),
        "xla_bf16": DPDistConfig(dtype="bfloat16"),
        "table_f32": DPDistConfig(fused_gather="table"),
        "table_bf16": DPDistConfig(dtype="bfloat16", fused_gather="table"),
    }
    params, state = init_dpdist(jax.random.PRNGKey(0), variants["xla_f32"])
    rng = np.random.default_rng(0)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (batch, 64, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-0.8, 0.8, (batch, 64, 3)).astype(np.float32))

    ref = None
    for name, cfg in variants.items():
        @jax.jit
        def fwd(p, s, a, b, cfg=cfg):
            ab, ba, _ = apply_dpdist(p, s, cfg, a, b, train=False)
            return ab, ba

        out = fwd(params, state, pcA, pcB)
        np.asarray(out[0])  # sync compile
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, state, pcA, pcB)
        a = np.asarray(out[0])
        dt = time.perf_counter() - t0
        if ref is None:
            ref = a
        print(json.dumps({
            "variant": name,
            "ms_per_fwd": round(1000 * dt / iters, 3),
            "pairs_per_sec": round(batch * iters / dt, 1),
            "maxdiff_vs_xla_f32": float(np.abs(a - ref).max()),
        }), flush=True)


if __name__ == "__main__":
    main()
