#!/usr/bin/env python3
"""On-chip compile + parity + A/B probe for the round-5 fused
mfv_table_gather_x front half (kernels/mfv_gather_pallas.py).

Stage 1: Mosaic compile + bit-level parity of the fused path vs the
shipped table path at the canonical config (f32 and bf16).
Stage 2: interleaved relative A/B of the full forward (table vs mfv),
alternating measurements so chip contention hits both arms equally.
Prints one JSON line per result. Safe to run contended (relative only;
re-run idle for absolute numbers).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.models import init_dpdist, apply_dpdist


def t_ms(fn, iters=20):
    np.asarray(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    B = 256
    rng = np.random.default_rng(0)
    base = DPDistConfig()          # auto -> table on TPU
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (B, base.num_point, 3))
                      .astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-1.0, 1.0, (B, base.num_point, 3))
                      .astype(np.float32))
    params, state = init_dpdist(jax.random.PRNGKey(0), base)

    for dt in ("float32", "bfloat16"):
        ctab = base.replace(dtype=dt, fused_gather="table")
        cmfv = base.replace(dtype=dt, fused_gather="mfv")
        def both(c):
            # consume BOTH directions (returning only pred_AB would let
            # XLA dead-code-eliminate the whole BA direction)
            def f(a, b):
                p_ab, p_ba, _ = apply_dpdist(params, state, c, a, b,
                                             train=False)
                return p_ab + p_ba
            return jax.jit(f)

        f_tab = both(ctab)
        f_mfv = both(cmfv)
        try:
            y_tab = np.asarray(f_tab(pcA, pcB), np.float32)
            y_mfv = np.asarray(f_mfv(pcA, pcB), np.float32)
        except Exception as e:
            print(json.dumps({"dtype": dt, "error": str(e)[:500]}),
                  flush=True)
            continue
        md = float(np.abs(y_tab - y_mfv).max())
        print(json.dumps({"dtype": dt, "parity_maxdiff": md}), flush=True)

        # Interleaved A/B (5 rounds of 20 iters each arm).
        tab_ms, mfv_ms = [], []
        for _ in range(5):
            tab_ms.append(t_ms(lambda: f_tab(pcA, pcB)))
            mfv_ms.append(t_ms(lambda: f_mfv(pcA, pcB)))
        print(json.dumps({
            "dtype": dt,
            "table_ms_med": round(float(np.median(tab_ms)), 3),
            "mfv_ms_med": round(float(np.median(mfv_ms)), 3),
            "speedup": round(float(np.median(tab_ms) / np.median(mfv_ms)), 3),
            "table_ms_all": [round(x, 2) for x in tab_ms],
            "mfv_ms_all": [round(x, 2) for x in mfv_ms],
        }), flush=True)

    # Train-path compile check (grad through the fused kernel on-chip).
    cmfv = base.replace(fused_gather="mfv")

    def loss(a):
        p, q, _ = apply_dpdist(params, state, cmfv, a, pcB, train=False)
        return jnp.mean(p[..., 0]) + jnp.mean(q[..., 0])

    try:
        g = jax.jit(jax.grad(loss))(pcA)
        print(json.dumps({"grad_compile": "ok",
                          "gnorm": float(jnp.linalg.norm(g))}), flush=True)
    except Exception as e:
        print(json.dumps({"grad_compile_error": str(e)[:500]}), flush=True)


if __name__ == "__main__":
    main()
