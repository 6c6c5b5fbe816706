#!/usr/bin/env python3
"""Micro-bench of the patch-table backward (the frozen-grad hot spot).

profile_frozen_grad.py showed the table+decoder VJP at ~11.4 ms/direction
where the decoder fwd+input-bwd is ~3.2 ms and the table fwd ~1.2 ms —
so ~7 ms sits in _table_gather_bwd_impl. Candidates:

  bwd_full        the shipped kernel (transposed matmul + 125-slice fold)
  bwd_nofold      matmul + accumulate only (emit first C columns) —
                  isolates the fold share
  bwd_sepfold     separable fold: the k^3 neighborhood is an outer
                  product of three 1-D windows, so the adjoint fold can
                  run as 3 passes of k shifted adds (15 big ops instead
                  of 125 small ones)
  bwd_xla         the XLA re-derivation (materializes the (B, V, k^3*C)
                  table adjoint in HBM)

Canonical shapes: B=256, N=64, g=8, k=5, C=20.
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpdist_tpu.kernels.table_gather_pallas import (
    _table_gather_bwd_impl,
    table_gather_bwd_xla_oracle,
)

B, N, g, k, C = 256, 64, 8, 5, 20
V, E = g ** 3, k ** 3 * 20


def t_ms(fn, iters=30):
    np.asarray(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return 1000 * (time.perf_counter() - t0) / iters


def _mk_kernel(fold: str):
    def kern(vox_ref, grad_ref, out_ref, tgrad_ref, accp_ref, *, nt):
        t_idx = pl.program_id(1)
        vox = vox_ref[0, 0]
        grad = grad_ref[0]
        T = vox.shape[0]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (V, T), 0)
        onehot_t = (vox[None, :] == iota_v).astype(jnp.float32)
        part = jnp.dot(onehot_t, grad, preferred_element_type=jnp.float32)

        @pl.when(t_idx == 0)
        def _():
            tgrad_ref[:, :] = part

        @pl.when(t_idx > 0)
        def _():
            tgrad_ref[:, :] = tgrad_ref[:, :] + part

        @pl.when(t_idx == nt - 1)
        def _():
            kh = k // 2
            if fold == "none":
                out_ref[0] = tgrad_ref[:, :C]
            elif fold == "full":
                P = g + 2 * kh
                accp_ref[...] = jnp.zeros((P, P, P, C), jnp.float32)
                o = 0
                for di in range(k):
                    for dj in range(k):
                        for dl in range(k):
                            tg_o = tgrad_ref[:, o * C:(o + 1) * C].reshape(
                                g, g, g, C)
                            accp_ref[di:di + g, dj:dj + g, dl:dl + g, :] = (
                                accp_ref[di:di + g, dj:dj + g, dl:dl + g, :]
                                + tg_o)
                            o += 1
                out_ref[0] = accp_ref[kh:kh + g, kh:kh + g, kh:kh + g,
                                      :].reshape(V, C)
            else:  # separable: fold z, then y, then x as whole-tensor ops
                # tgrad (V, k^3*C) == (gx gy gz, kx ky kz, C) row-major
                tg = tgrad_ref[:, :].reshape(g, g, g, k, k, k, C)
                # fold kz against gz: dvol_z[z] = sum_dl tg[..., z+kh-dl_idx]
                zp = jnp.pad(tg, ((0, 0), (0, 0), (kh, kh), (0, 0), (0, 0),
                                  (0, 0), (0, 0)))
                acc_z = jnp.zeros((g, g, g, k, k, C), jnp.float32)
                for dl in range(k):
                    acc_z = acc_z + zp[:, :, dl:dl + g, :, :, dl, :]
                yp = jnp.pad(acc_z, ((0, 0), (kh, kh), (0, 0), (0, 0),
                                     (0, 0), (0, 0)))
                acc_y = jnp.zeros((g, g, g, k, C), jnp.float32)
                for dj in range(k):
                    acc_y = acc_y + yp[:, dj:dj + g, :, :, dj, :]
                xp = jnp.pad(acc_y, ((kh, kh), (0, 0), (0, 0), (0, 0),
                                     (0, 0)))
                acc_x = jnp.zeros((g, g, g, C), jnp.float32)
                for di in range(k):
                    acc_x = acc_x + xp[di:di + g, :, :, di, :]
                out_ref[0] = acc_x.reshape(V, C)

    return kern


def run_variant(fold, vox, grad):
    tile = int(min(max(8, -(-N // 8) * 8), 128))
    nt = -(-N // tile)
    kern = functools.partial(_mk_kernel(fold), nt=nt)
    kh = k // 2
    return pl.pallas_call(
        kern,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, E), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, V, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, V, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((V, E), jnp.float32),
            pltpu.VMEM((g + 2 * kh,) * 3 + (C,), jnp.float32),
        ],
    )(vox[:, None, :], grad)


def main():
    rng = np.random.default_rng(0)
    vox = jnp.asarray(rng.integers(0, V, (B, N)).astype(np.int32))
    grad = jnp.asarray(rng.standard_normal((B, N, E)).astype(np.float32))

    ship = jax.jit(lambda v, gr: _table_gather_bwd_impl(
        v, gr, grid_size=g, k=k, dtype=jnp.float32, interpret=False))
    xla = jax.jit(lambda v, gr: table_gather_bwd_xla_oracle(
        v, gr, grid_size=g, k=k, dtype=jnp.float32))
    variants = {
        "bwd_shipped": lambda: ship(vox, grad),
        "bwd_nofold": jax.jit(lambda: run_variant("none", vox, grad)),
        "bwd_fullfold": jax.jit(lambda: run_variant("full", vox, grad)),
        "bwd_sepfold": jax.jit(lambda: run_variant("sep", vox, grad)),
        "bwd_xla": lambda: xla(vox, grad),
    }
    out = {}
    for name, fn in variants.items():
        try:
            ms = t_ms(fn)
        except Exception as e:
            ms = f"ERROR: {str(e)[:200]}"
        out[name] = ms
        print(json.dumps({"variant": name, "ms": ms}), flush=True)

    # numeric check: sepfold must equal the shipped fold
    a = np.asarray(run_variant("sep", vox, grad))
    b = np.asarray(ship(vox, grad))
    print(json.dumps({"sep_vs_shipped_maxdiff": float(np.abs(a - b).max())}))


if __name__ == "__main__":
    main()
