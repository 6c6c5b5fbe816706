#!/usr/bin/env python3
"""Mosaic crash isolation, round 3 of probes (see NEXT.md / CLAUDE.md:
the V-in-lanes transposed table backward crashes the TPU compile helper
while all four v2 probes — unaligned sublane read, unaligned lane read,
broadcast where-mask, big-scratch partial writes — pass individually).

This battery bisects the ACTUAL kernel structure
(`kernels/table_gather_pallas.py:_bwd_kernel_transposed`) feature by
feature at canonical dims (g=8, k=5 -> V=512, C=20, E=2500, HALO=146):

  a  in-kernel one-hot matmul writing the (E, V) result into the center
     of the lane-padded scratch
  b  the 125-offset fold alone (scratch pre-filled from input): masked
     lane-shifted slab adds with BOTH dims of the slab read unaligned
     (sublane offset o*20, lane offset HALO+off) — the one combination
     v2 never tested
  b2 fold with the sublane dim pre-aligned (slabs read at o*24 with C
     padded to 24): isolates whether the 2-D unaligned read is the
     trigger
  c  a + b in one kernel, single grid cell (the full kernel minus the
     grid/when accumulation)
  d  the real `_table_gather_bwd_transposed` at B=1, N=128 (control —
     expected to crash if nothing above does; then grid/when is the
     trigger)

Each probe compiles + runs a tiny dispatch; failures print the first
line of the error. Safe to run on a shared chip (sub-second work).
"""

import functools
import os

import numpy as np
import jax

if os.environ.get("PROBE_INTERPRET"):
    # CPU smoke must not touch the (possibly down) axon relay; the
    # sitecustomize pin ignores JAX_PLATFORMS (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = bool(os.environ.get("PROBE_INTERPRET"))  # CPU smoke mode
# Canonical dims on TPU; tiny dims under interpret (the CPU smoke only
# validates shapes/logic — interpret at E=2500 takes >10 min on 1 core).
G, K = (4, 3) if INTERP else (8, 5)
V, KH = G ** 3, K // 2
C = 20
E = K ** 3 * C                      # 2500 (540 smoke)
HALO = KH * (G * G + G + 1)         # 146 (21 smoke)
T = 128 if not INTERP else 16       # points per tile
DT = jnp.float32


def run(name, fn):
    try:
        np.asarray(fn())
        print(f"PROBE {name} OK", flush=True)
    except Exception as e:  # noqa: BLE001 - report and continue
        msg = str(e).replace("\n", " ")[:160]
        print(f"PROBE {name} FAIL: {msg}", flush=True)


def fold_body(out_ref, pad_ref, c_stride):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    vx, vy, vz = lane // (G * G), (lane // G) % G, lane % G
    out_ref[...] = jnp.zeros((C, V), DT)
    o = 0
    for di in range(K):
        for dj in range(K):
            for dl in range(K):
                sx, sy, sz = KH - di, KH - dj, KH - dl
                off = sx * G * G + sy * G + sz
                m = ((vx + sx >= 0) & (vx + sx < G)
                     & (vy + sy >= 0) & (vy + sy < G)
                     & (vz + sz >= 0) & (vz + sz < G))
                slab = pad_ref[o * c_stride:o * c_stride + C,
                               HALO + off:HALO + off + V]
                out_ref[...] = out_ref[...] + jnp.where(m, slab, 0.0)
                o += 1


# --- a: matmul -> padded scratch center ------------------------------
def kern_a(vox_ref, gT_ref, out_ref, pad_ref):
    vox = vox_ref[0]                                     # (T,)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (T, V), 1)
    onehot = (vox[:, None] == iota_v).astype(DT)
    part = jnp.dot(gT_ref[...], onehot,
                   preferred_element_type=jnp.float32)   # (E, V)
    pad_ref[:, :HALO] = jnp.zeros((E, HALO), jnp.float32)
    pad_ref[:, HALO + V:] = jnp.zeros((E, HALO), jnp.float32)
    pad_ref[:, HALO:HALO + V] = part
    out_ref[...] = pad_ref[0:8, HALO:HALO + V]


# --- b / b2: fold alone ----------------------------------------------
def kern_b(part_ref, out_ref, pad_ref, *, c_stride, rows):
    pad_ref[...] = jnp.zeros((rows, V + 2 * HALO), jnp.float32)
    pad_ref[0:E, HALO:HALO + V] = part_ref[...]
    fold_body(out_ref, pad_ref, c_stride)


def kern_b2(part_ref, out_ref, pad_ref, *, c_stride, rows):
    pad_ref[...] = jnp.zeros((rows, V + 2 * HALO), jnp.float32)
    # aligned layout: offset slab o into row o*24 (8-aligned via pad)
    for o in range(K ** 3):
        pad_ref[o * c_stride:o * c_stride + C, HALO:HALO + V] = \
            part_ref[o * C:(o + 1) * C, :]
    fold_body(out_ref, pad_ref, c_stride)


# --- c: matmul + fold, one grid cell ---------------------------------
def kern_c(vox_ref, gT_ref, out_ref, pad_ref):
    vox = vox_ref[0]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (T, V), 1)
    onehot = (vox[:, None] == iota_v).astype(DT)
    part = jnp.dot(gT_ref[...], onehot, preferred_element_type=jnp.float32)
    pad_ref[:, :HALO] = jnp.zeros((E, HALO), jnp.float32)
    pad_ref[:, HALO + V:] = jnp.zeros((E, HALO), jnp.float32)
    pad_ref[:, HALO:HALO + V] = part
    fold_body(out_ref, pad_ref, C)


def main():
    rng = np.random.default_rng(0)
    vox = jnp.asarray(rng.integers(0, V, (T,)), jnp.int32)
    gT = jnp.asarray(rng.standard_normal((E, T)), DT)
    part = jnp.asarray(rng.standard_normal((E, V)), DT)

    run("a_matmul_scratch", lambda: pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((8, V), DT), interpret=INTERP,
        scratch_shapes=[pltpu.VMEM((E, V + 2 * HALO), jnp.float32)],
    )(vox[None, :], gT))

    run("b_fold_unaligned", lambda: pl.pallas_call(
        functools.partial(kern_b, c_stride=C, rows=E),
        out_shape=jax.ShapeDtypeStruct((C, V), DT), interpret=INTERP,
        scratch_shapes=[pltpu.VMEM((E, V + 2 * HALO), jnp.float32)],
    )(part))

    rows2 = K ** 3 * 24
    run("b2_fold_aligned24", lambda: pl.pallas_call(
        functools.partial(kern_b2, c_stride=24, rows=rows2),
        out_shape=jax.ShapeDtypeStruct((C, V), DT), interpret=INTERP,
        scratch_shapes=[pltpu.VMEM((rows2, V + 2 * HALO), jnp.float32)],
    )(part))

    run("c_matmul_fold", lambda: pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct((C, V), DT), interpret=INTERP,
        scratch_shapes=[pltpu.VMEM((E, V + 2 * HALO), jnp.float32)],
    )(vox[None, :], gT))

    from dpdist_tpu.kernels.table_gather_pallas import (
        _table_gather_bwd_impl, _table_gather_bwd_transposed,
        _table_gather_bwd_transposed_ng)
    voxB = jnp.asarray(rng.integers(0, V, (1, T)), jnp.int32)
    gradB = jnp.asarray(rng.standard_normal((1, T, E)), DT)
    run("d_full_bwd_transposed", lambda: _table_gather_bwd_transposed(
        voxB, gradB, grid_size=G, k=K, dtype=DT, interpret=INTERP))

    # e: the single-block no-grid variant at the canonical serving shape
    # (N=64 -> one query tile) — if grid/when structure is the crash
    # trigger, this must compile where d does not. Checked numerically
    # against the shipping 4-D fold backward.
    voxS = jnp.asarray(rng.integers(0, V, (1, 64)), jnp.int32)
    gradS = jnp.asarray(rng.standard_normal((1, 64, E)), DT)

    def probe_e():
        got = _table_gather_bwd_transposed_ng(
            voxS, gradS, grid_size=G, k=K, dtype=DT, interpret=INTERP)
        ref = _table_gather_bwd_impl(
            voxS, gradS, grid_size=G, k=K, dtype=DT, interpret=INTERP)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"  e maxdiff vs 4-D fold: {err:.2e}", flush=True)
        assert err < 1e-4, f"ng parity FAILED maxdiff={err}"
        return got
    run("e_full_bwd_transposed_ng", probe_e)


if __name__ == "__main__":
    main()
