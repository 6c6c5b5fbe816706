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
    _table_gather_bwd_transposed_ng,
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
            elif fold == "lanes":
                # merged (z, C) lane layout: scratch (P, P, P*C); each
                # offset's slab is (g, g, g*C) added at sublane offsets
                # (di, dj) and LANE offset dl*C — lane-contiguous, so
                # Mosaic emits ~8x2 tiled ops instead of 64 tiny (8, 20)
                # pieces per slice-add.
                P = g + 2 * kh
                accp_ref[...] = jnp.zeros((P, P, P * C), jnp.float32)
                o = 0
                for di in range(k):
                    for dj in range(k):
                        for dl in range(k):
                            tg_o = tgrad_ref[:, o * C:(o + 1) * C].reshape(
                                g, g, g * C)
                            accp_ref[di:di + g, dj:dj + g,
                                     dl * C:dl * C + g * C] = (
                                accp_ref[di:di + g, dj:dj + g,
                                         dl * C:dl * C + g * C] + tg_o)
                            o += 1
                out_ref[0] = accp_ref[kh:kh + g, kh:kh + g,
                                      kh * C:(kh + g) * C].reshape(V, C)
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


def _onehot_fold_kernel(vox_ref, grad_ref, out_ref, *, nt, n_chunks):
    """Fold-free backward: dvol[w,c] = sum_{t,o} grad[t,o,c] *
    [vox[t] shifted by offset o == w]. One chunked MXU matmul against a
    one-hot built on the SHIFTED index — no table adjoint, no fold pass.
    """
    t_idx = pl.program_id(1)
    vox = vox_ref[0, 0]                       # (T,)
    grad = grad_ref[0]                        # (T, E)
    T = vox.shape[0]
    kh = k // 2
    # decompose vox -> (x, y, z), precompute shifted flat index per offset
    vz = vox % g
    vy = (vox // g) % g
    vx = vox // (g * g)
    per_chunk = k * k * k // n_chunks
    acc = jnp.zeros((V, C), jnp.float32)
    for ci in range(n_chunks):
        idx_cols = []
        for oi in range(ci * per_chunk, (ci + 1) * per_chunk):
            di, rem = oi // (k * k), oi % (k * k)
            dj, dl = rem // k, rem % k
            nx, ny, nz = vx + (di - kh), vy + (dj - kh), vz + (dl - kh)
            valid = ((nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
                     & (nz >= 0) & (nz < g))
            w = nx * g * g + ny * g + nz
            idx_cols.append(jnp.where(valid, w, -1))
        w_idx = jnp.stack(idx_cols, axis=1).reshape(T * per_chunk)  # (T*pc,)
        gslice = grad[:, ci * per_chunk * C:(ci + 1) * per_chunk * C]
        gmat = gslice.reshape(T * per_chunk, C)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (V, T * per_chunk), 0)
        onehot = (w_idx[None, :] == iota_v).astype(jnp.float32)
        acc = acc + jnp.dot(onehot, gmat,
                            preferred_element_type=jnp.float32)

    @pl.when(t_idx == 0)
    def _():
        out_ref[0] = acc

    @pl.when(t_idx > 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def run_onehot_fold(vox, grad, n_chunks=5):
    tile = int(min(max(8, -(-N // 8) * 8), 128))
    nt = -(-N // tile)
    kern = functools.partial(_onehot_fold_kernel, nt=nt, n_chunks=n_chunks)
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
    )(vox[:, None, :], grad)


def _transposed_kernel(vox_ref, gradT_ref, out_ref, pad_ref, *, nt):
    """V-in-lanes backward: the matmul emits tgrad_T (E, V) into the
    center columns of a lane-padded scratch; the fold is then 125
    LANE-shifted masked adds of full-width (C, V) slabs — dense vector
    packing instead of the (8, 20)-tile fragments of the 4-D layout.
    Caller passes grad pre-transposed (B, E, T) and transposes the
    (B, C, V) output back outside (cheap XLA moves)."""
    t_idx = pl.program_id(1)
    vox = vox_ref[0, 0]                          # (T,)
    gradT = gradT_ref[0]                         # (E, T)
    T = vox.shape[0]
    kh = k // 2
    # max |flat shift| = kh*(g*g + g + 1)
    HALO = kh * (g * g + g + 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (T, V), 1)
    onehot = (vox[:, None] == iota_v).astype(jnp.float32)   # (T, V)
    part = jnp.dot(gradT, onehot, preferred_element_type=jnp.float32)

    @pl.when(t_idx == 0)
    def _():
        pad_ref[:, :HALO] = jnp.zeros((E, HALO), jnp.float32)
        pad_ref[:, HALO + V:] = jnp.zeros((E, HALO), jnp.float32)
        pad_ref[:, HALO:HALO + V] = part

    @pl.when(t_idx > 0)
    def _():
        pad_ref[:, HALO:HALO + V] = pad_ref[:, HALO:HALO + V] + part

    @pl.when(t_idx == nt - 1)
    def _():
        # lane iota -> voxel components of the OUTPUT index v
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        vx, vy, vz = lane // (g * g), (lane // g) % g, lane % g
        out_ref[0] = jnp.zeros((C, V), jnp.float32)
        o = 0
        for di in range(k):
            for dj in range(k):
                for dl in range(k):
                    # adjoint of table[v, o] = vol[v + d - kh]:
                    # dvol[v] += tgrad_o[v + kh - d], valid only when
                    # every component of v + kh - d stays in-grid
                    sx, sy, sz = kh - di, kh - dj, kh - dl
                    off = sx * g * g + sy * g + sz
                    m = ((vx + sx >= 0) & (vx + sx < g)
                         & (vy + sy >= 0) & (vy + sy < g)
                         & (vz + sz >= 0) & (vz + sz < g))
                    slab = pad_ref[o * C:(o + 1) * C,
                                   HALO + off:HALO + off + V]
                    out_ref[0] = out_ref[0] + jnp.where(m, slab, 0.0)
                    o += 1


def run_transposed(vox, gradT, interpret=False):
    tile = int(min(max(8, -(-N // 8) * 8), 128))
    nt = -(-N // tile)
    kh = k // 2
    HALO = kh * (g * g + g + 1)
    kern = functools.partial(_transposed_kernel, nt=nt)
    out_T = pl.pallas_call(
        kern,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, V), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, V), jnp.float32),
        scratch_shapes=[pltpu.VMEM((E, V + 2 * HALO), jnp.float32)],
        interpret=interpret,
    )(vox[:, None, :], gradT)
    return jnp.swapaxes(out_T, 1, 2)  # (B, V, C)


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
            (pltpu.VMEM((g + 2 * kh,) * 2 + ((g + 2 * kh) * C,), jnp.float32)
             if fold == "lanes" else
             pltpu.VMEM((g + 2 * kh,) * 3 + (C,), jnp.float32)),
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
    gradT = jnp.swapaxes(grad, 1, 2)
    variants = {
        "bwd_shipped": lambda: ship(vox, grad),
        "bwd_nofold": jax.jit(lambda: run_variant("none", vox, grad)),
        "bwd_transposed": jax.jit(lambda: run_transposed(vox, gradT)),
        "bwd_transposed_incl_T": jax.jit(
            lambda: run_transposed(vox, jnp.swapaxes(grad, 1, 2))),
        # library single-block no-grid variant (N<=128 path; includes the
        # in-jit transpose both ways, i.e. what training would pay)
        "bwd_transposed_ng": jax.jit(
            lambda: _table_gather_bwd_transposed_ng(
                vox, grad, grid_size=g, k=k, dtype=jnp.float32,
                interpret=False)),
        "bwd_xla": lambda: xla(vox, grad),
    }
    # Excluded candidates (for the record):
    # - onehot_fold (fold absorbed into a shifted-index one-hot matmul):
    #   numerically correct in interpret but CRASHES the Mosaic compiler
    #   (tpu_compile_helper exit 1) for every chunking; also its (V, C=20)
    #   output matmul runs the MXU at ~16% lane utilization, so even
    #   compiled it would not beat the full-width (V, E) matmul + a cheap
    #   fold.
    # - sepfold: per-axis index math wrong (interpret maxdiff 14.7),
    #   superseded by lanesfold before being debugged.
    # - nofold: measured 25 ms under chip contention (slower than the
    #   full kernel — contended numbers, kept out of the comparison).
    out = {}
    for name, fn in variants.items():
        try:
            ms = t_ms(fn)
        except Exception as e:
            ms = f"ERROR: {str(e)[:200]}"
        out[name] = ms
        print(json.dumps({"variant": name, "ms": ms}), flush=True)

    # numeric checks vs the shipped fold
    b = np.asarray(ship(vox, grad))
    for nm, fn in (
            ("transposed", lambda: run_transposed(vox, gradT)),
            ("transposed_ng", lambda: _table_gather_bwd_transposed_ng(
                vox, grad, grid_size=g, k=k, dtype=jnp.float32,
                interpret=False)),
    ):
        try:
            a = np.asarray(fn())
            print(json.dumps(
                {f"{nm}_vs_shipped_maxdiff": float(np.abs(a - b).max())}))
        except Exception as e:
            print(json.dumps({f"{nm}_check": f"ERROR: {str(e)[:200]}"}))


if __name__ == "__main__":
    main()
