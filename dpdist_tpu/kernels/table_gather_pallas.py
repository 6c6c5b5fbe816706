"""Fused patch-table + gather: build each cloud's k^3 patch table in VMEM.

The XLA path materializes the (B, V, k^3*C) patch table in HBM
(ops/voxel.extract_patches) and fetches query rows with a one-hot matmul
(gather_patches) — at the canonical config (B=256, V=512, k=5, C=20) the
table is the forward's largest tensor (1.3 GB f32 / 0.65 GB bf16) and its
HBM write+read dominates the non-decoder time.

This kernel exploits that the RAW FV volume is tiny (V x C = 40 KB per
cloud): per batch element it
  1. loads fv (V, C) into VMEM and builds the full (V, k^3*C) patch table
     in a VMEM scratch via k^3 static shifted slices of the zero-padded
     volume (the same construction as extract_patches, SAME padding);
  2. one-hot-encodes the query voxel ids against the voxel axis; and
  3. runs ONE MXU matmul (N, V) @ (V, k^3*C) — full-width lanes, unlike a
     per-offset gather (C=20 starves the MXU; see gather_pallas.py's
     measured loss).
HBM traffic becomes fv in + output out — the table never leaves VMEM.

Gradients: the op is linear in fv; the custom VJP runs a mirrored Pallas
kernel (round 3): the transposed one-hot matmul (V, N) @ (N, k^3*C)
produces the patch-table adjoint in a VMEM scratch, which is folded back
to the (V, C) volume via the transposed pad+slice construction — so the
TRAINING path's backward never materializes the (B, V, k^3*C) table in
HBM either (it previously did, via the XLA re-derivation; that path is
kept as the oracle in tests/test_kernels.py).

Reference semantics reproduced: utils/dpdist_util.py local_z_3d
(:911-960, tf.extract_volume_patches SAME) + get_emb_and_concat gather
(:434-457); off-grid queries read voxel 0's patch before output masking,
exactly like the reference's argmax-of-zero-mask behavior (:459-492).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_patch_table(fv, table_ref, *, g: int, k: int, C: int, V: int):
    """Build the (V, k^3*C) patch table in the VMEM scratch
    (extract_patches ordering: offsets row-major over (di, dj, dl), SAME
    zero padding)."""
    kh = k // 2
    vol = fv.reshape(g, g, g, C)
    padded = jnp.pad(vol, ((kh, kh), (kh, kh), (kh, kh), (0, 0)))
    o = 0
    for di in range(k):
        for dj in range(k):
            for dl in range(k):
                sl = padded[di:di + g, dj:dj + g, dl:dl + g, :]
                table_ref[:, o * C:(o + 1) * C] = sl.reshape(V, C)
                o += 1


def gather_rows(table_ref, vox, *, V: int, dtype):
    """One-hot MXU gather of the queries' voxel rows from the VMEM table
    with f32 accumulation."""
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (vox.shape[0], V), 1)
    onehot = (vox[:, None] == iota_v).astype(dtype)
    return jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)


def build_table_and_gather(fv, vox, table_ref, *, g: int, k: int, C: int,
                           V: int, dtype):
    """In-kernel helper shared with fused_forward_pallas: build + gather."""
    build_patch_table(fv, table_ref, g=g, k=k, C=C, V=V)
    return gather_rows(table_ref, vox, V=V, dtype=dtype)


def _kernel(vox_ref, fv_ref, out_ref, table_ref, *, g: int, k: int, C: int,
            V: int, dtype):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        build_patch_table(fv_ref[0], table_ref, g=g, k=k, C=C, V=V)

    emb = gather_rows(table_ref, vox_ref[0, 0], V=V, dtype=dtype)
    out_ref[0] = emb.astype(dtype)


def _table_gather_impl(fv, vox, *, grid_size: int, k: int,
                       interpret: bool = False):
    B, V, C = fv.shape
    N = vox.shape[1]
    g = grid_size
    assert V == g ** 3, (V, g)
    E = k ** 3 * C
    dtype = fv.dtype
    # Query-axis tiling keeps blocks + scratch under the 16 MB scoped
    # VMEM budget at large N. This kernel carries no query/delta blocks,
    # so its tile cap is 256 (measured fit at f32: ~13.8 MB) — twice the
    # x-kernel's 128.
    tile = int(min(max(8, -(-N // 8) * 8), 256))
    nt = -(-N // tile)
    Np = nt * tile
    if Np != N:
        vox = jnp.concatenate(
            [vox, jnp.zeros((B, Np - N), vox.dtype)], axis=1)
    kernel = functools.partial(_kernel, g=g, k=k, C=C, V=V, dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            # (B, 1, N) so the block's trailing dims equal the array dims
            # (Mosaic tiling rule: divisible by (8, 128) or full-size).
            pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, E), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, E), dtype),
        scratch_shapes=[pltpu.VMEM((V, E), dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * V * E,
            bytes_accessed=B * (V * C + N * E) * fv.dtype.itemsize,
            transcendentals=0,
        ),
    )(vox[:, None, :], fv)
    return out[:, :N] if Np != N else out


def table_gather(fv, vox, grid_size: int, k: int, interpret: bool = False):
    """(B, V, C) fv + (B, N) voxel ids -> (B, N, k^3*C) gathered patches.

    Equivalent to gather_patches(extract_patches(fv, g, k), vox, mask)
    without materializing the table. Differentiable in fv (linear); vox is
    integer data. Falls back to interpret mode off-TPU (tests/smoke).
    """
    if not interpret:
        from dpdist_tpu.ops.threedmfv import _on_tpu

        interpret = not _on_tpu()
    return _table_gather_diff(fv, vox, grid_size, k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _table_gather_diff(fv, vox, grid_size: int, k: int, interpret: bool):
    return _table_gather_impl(fv, vox, grid_size=grid_size, k=k,
                              interpret=interpret)


def _tg_fwd(fv, vox, grid_size, k, interpret):
    out = _table_gather_impl(fv, vox, grid_size=grid_size, k=k,
                             interpret=interpret)
    # The op is linear in fv; the backward needs only fv's dtype (carried
    # by a 0-d proto) + vox — shapes reconstruct from vox/grad statics.
    return out, (jnp.zeros((), fv.dtype), vox)


def _bwd_kernel(vox_ref, grad_ref, out_ref, tgrad_ref, accp_ref, *, g: int,
                k: int, C: int, V: int, dtype, nt: int):
    """Adjoint of build_table_and_gather, entirely in VMEM.

    1. table-adjoint: tgrad = onehot(vox)^T (V, T) @ grad (T, E) on the
       MXU (the transpose of the forward's gather matmul), accumulated
       across sequential query tiles in the persistent scratch (padded
       tail rows carry zero grad, so they contribute nothing);
    2. fold (last tile): the forward writes table[:, o] =
       padded_vol[off_o : off_o+g] per offset o, so
       dvol[x] = sum_o tgrad_o[x + kh - off_o] — the transposed
       pad+static-slice construction (zero contributions where the
       shifted index falls outside the grid).
    """
    t_idx = pl.program_id(1)
    vox = vox_ref[0, 0]                                 # (T,)
    grad = grad_ref[0]                                  # (T, E)
    T = vox.shape[0]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (V, T), 0)
    onehot_t = (vox[None, :] == iota_v).astype(dtype)   # (V, T)
    part = jnp.dot(onehot_t, grad.astype(dtype),
                   preferred_element_type=jnp.float32)

    @pl.when(t_idx == 0)
    def _():
        tgrad_ref[:, :] = part

    @pl.when(t_idx > 0)
    def _():
        tgrad_ref[:, :] = tgrad_ref[:, :] + part

    @pl.when(t_idx == nt - 1)
    def _():
        _fold_and_emit(out_ref, tgrad_ref, accp_ref, g=g, k=k, C=C, V=V,
                       dtype=dtype)


def _fold_and_emit(out_ref, tgrad_ref, accp_ref, *, g, k, C, V, dtype):
    kh = k // 2
    # In-place accumulation on ONE padded VMEM scratch (the transposed
    # pad+slice construction), via static-slice read-modify-write on the
    # ref — the pallas idiom the forward's table writes use. (A jnp.pad
    # per offset allocates 125 distinct VMEM buffers and blows the 16 MB
    # scoped limit; a value-level .at[].add lowers to scatter-add, which
    # Mosaic does not implement.)
    P = g + 2 * kh
    accp_ref[...] = jnp.zeros((P, P, P, C), jnp.float32)
    o = 0
    for di in range(k):
        for dj in range(k):
            for dl in range(k):
                tg_o = tgrad_ref[:, o * C:(o + 1) * C].reshape(g, g, g, C)
                accp_ref[di:di + g, dj:dj + g, dl:dl + g, :] = (
                    accp_ref[di:di + g, dj:dj + g, dl:dl + g, :] + tg_o)
                o += 1
    out_ref[0] = accp_ref[kh:kh + g, kh:kh + g, kh:kh + g, :].reshape(
        V, C).astype(dtype)


def _table_gather_bwd_impl(vox, grad, *, grid_size: int, k: int,
                           dtype, interpret: bool):
    B, N = vox.shape
    g = grid_size
    V = g ** 3
    E = grad.shape[-1]
    C = E // k ** 3
    # Query-axis tiling like the forward (padded tail rows carry zero
    # grad, so the accumulated table-adjoint is unaffected).
    tile = int(min(max(8, -(-N // 8) * 8), 128))
    nt = -(-N // tile)
    Np = nt * tile
    if Np != N:
        vox = jnp.concatenate(
            [vox, jnp.zeros((B, Np - N), vox.dtype)], axis=1)
        grad = jnp.concatenate(
            [grad, jnp.zeros((B, Np - N, E), grad.dtype)], axis=1)
    kernel = functools.partial(_bwd_kernel, g=g, k=k, C=C, V=V,
                               dtype=jnp.dtype(dtype), nt=nt)
    return pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, E), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, V, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, V, C), dtype),
        scratch_shapes=[
            pltpu.VMEM((V, E), jnp.float32),
            pltpu.VMEM((g + 2 * (k // 2),) * 3 + (C,), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * V * N * E,
            bytes_accessed=B * (N * E + V * C) * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(vox[:, None, :], grad)


def _bwd_kernel_transposed(vox_ref, gradT_ref, out_ref, pad_ref, *, g: int,
                           k: int, C: int, V: int, E: int, dtype, nt: int):
    """V-in-lanes backward (round 4): the transposed one-hot matmul emits
    the table adjoint as (E, V) — V = 512 is 4 FULL lane tiles — into the
    center columns of a lane-padded scratch; the fold is then k^3
    lane-shifted masked adds of dense (C, V) slabs. The 4-D fold layout's
    (8, 8, 8, C=20) slice-adds fragment into ~64 (sublane, 20-lane) tiles
    each at ~16% lane utilization; here every vector op runs full-width.

    Two Mosaic constraints shaped this (see scripts/bench_table_bwd_variants
    probes): value reshapes that merge sublanes into lanes crash the
    compiler, so the relayout happens via the matmul's output orientation
    instead; and deep value-accumulation chains (125-term acc = acc + x)
    also crash it, so the fold accumulates via ref read-modify-write.
    """
    t_idx = pl.program_id(1)
    vox = vox_ref[0, 0]                          # (T,)
    gradT = gradT_ref[0]                         # (E, T)
    T = vox.shape[0]
    kh = k // 2
    HALO = kh * (g * g + g + 1)                  # max |flat z-major shift|
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (T, V), 1)
    onehot = (vox[:, None] == iota_v).astype(dtype)          # (T, V)
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
        _lanes_fold(out_ref, pad_ref, g=g, k=k, C=C, V=V, HALO=HALO,
                    dtype=dtype)


def _lanes_fold(out_ref, pad_ref, *, g, k, C, V, HALO, dtype):
    """The V-in-lanes fold: k^3 lane-shifted masked adds of dense (C, V)
    slabs read from the lane-padded (E, V + 2*HALO) scratch."""
    kh = k // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    vx, vy, vz = lane // (g * g), (lane // g) % g, lane % g
    out_ref[0] = jnp.zeros((C, V), dtype)
    o = 0
    for di in range(k):
        for dj in range(k):
            for dl in range(k):
                # adjoint of table[v, o] = vol[v + d - kh]:
                # dvol[v] += tgrad_o[v + kh - d], valid only where
                # every component of v + kh - d stays in-grid
                sx, sy, sz = kh - di, kh - dj, kh - dl
                off = sx * g * g + sy * g + sz
                m = ((vx + sx >= 0) & (vx + sx < g)
                     & (vy + sy >= 0) & (vy + sy < g)
                     & (vz + sz >= 0) & (vz + sz < g))
                slab = pad_ref[o * C:(o + 1) * C,
                               HALO + off:HALO + off + V]
                out_ref[0] = out_ref[0] + jnp.where(
                    m, slab, 0.0).astype(dtype)
                o += 1


def _bwd_kernel_transposed_ng(vox_ref, gradT_ref, out_ref, pad_ref, *,
                              g: int, k: int, C: int, V: int, E: int,
                              dtype):
    """No-grid variant of _bwd_kernel_transposed: at the canonical N=64
    the query axis fits one tile anyway (nt == 1), so the whole backward
    is a single block per batch item — no query grid dimension and no
    pl.when. Exists to bisect/sidestep the Mosaic compile crash that the
    gridded kernel hits on TPU (scripts/probe_mosaic_v3.py probe d vs c:
    identical ops, the only difference is grid/when structure)."""
    kh = k // 2
    HALO = kh * (g * g + g + 1)
    vox = vox_ref[0, 0]                          # (Np,)
    gradT = gradT_ref[0]                         # (E, Np)
    T = vox.shape[0]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (T, V), 1)
    onehot = (vox[:, None] == iota_v).astype(dtype)          # (Np, V)
    part = jnp.dot(gradT, onehot, preferred_element_type=jnp.float32)
    pad_ref[:, :HALO] = jnp.zeros((E, HALO), jnp.float32)
    pad_ref[:, HALO + V:] = jnp.zeros((E, HALO), jnp.float32)
    pad_ref[:, HALO:HALO + V] = part
    _lanes_fold(out_ref, pad_ref, g=g, k=k, C=C, V=V, HALO=HALO,
                dtype=dtype)


def _table_gather_bwd_transposed_ng(vox, grad, *, grid_size: int, k: int,
                                    dtype, interpret: bool):
    """Single-block transposed backward (no query grid): valid when the
    padded query count fits one VMEM tile (N <= 128 — always true at the
    canonical np=64). Falls back to the gridded transposed kernel above
    that size."""
    B, N = vox.shape
    if N > 128:
        return _table_gather_bwd_transposed(
            vox, grad, grid_size=grid_size, k=k, dtype=dtype,
            interpret=interpret)
    g = grid_size
    V = g ** 3
    E = grad.shape[-1]
    C = E // k ** 3
    kh = k // 2
    HALO = kh * (g * g + g + 1)
    Np = -(-N // 8) * 8
    if Np != N:
        vox = jnp.concatenate(
            [vox, jnp.zeros((B, Np - N), vox.dtype)], axis=1)
        grad = jnp.concatenate(
            [grad, jnp.zeros((B, Np - N, E), grad.dtype)], axis=1)
    gradT = jnp.swapaxes(grad, 1, 2)             # (B, E, Np)
    kernel = functools.partial(_bwd_kernel_transposed_ng, g=g, k=k, C=C,
                               V=V, E=E, dtype=jnp.dtype(dtype))
    out_T = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, V), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, V), dtype),
        scratch_shapes=[pltpu.VMEM((E, V + 2 * HALO), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * V * N * E,
            bytes_accessed=B * (N * E + V * C) * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(vox[:, None, :], gradT)
    return jnp.swapaxes(out_T, 1, 2)             # (B, V, C)


def _table_gather_bwd_transposed(vox, grad, *, grid_size: int, k: int,
                                 dtype, interpret: bool):
    """Transposed-layout backward: same contract as
    _table_gather_bwd_impl (vox (B, N), grad (B, N, E) -> dfv (B, V, C));
    the (B, E, N) / (B, C, V) relayouts are cheap XLA transposes."""
    B, N = vox.shape
    g = grid_size
    V = g ** 3
    E = grad.shape[-1]
    C = E // k ** 3
    kh = k // 2
    HALO = kh * (g * g + g + 1)
    tile = int(min(max(8, -(-N // 8) * 8), 128))
    nt = -(-N // tile)
    Np = nt * tile
    if Np != N:
        vox = jnp.concatenate(
            [vox, jnp.zeros((B, Np - N), vox.dtype)], axis=1)
        grad = jnp.concatenate(
            [grad, jnp.zeros((B, Np - N, E), grad.dtype)], axis=1)
    gradT = jnp.swapaxes(grad, 1, 2)             # (B, E, Np)
    kernel = functools.partial(_bwd_kernel_transposed, g=g, k=k, C=C, V=V,
                               E=E, dtype=jnp.dtype(dtype), nt=nt)
    out_T = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, V), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, V), dtype),
        scratch_shapes=[pltpu.VMEM((E, V + 2 * HALO), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * V * N * E,
            bytes_accessed=B * (N * E + V * C) * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(vox[:, None, :], gradT)
    return jnp.swapaxes(out_T, 1, 2)             # (B, V, C)


# Backward implementation selector: 'fold' = the 4-D padded-scratch fold
# (round 3), 'transposed' = the V-in-lanes fold (round 4). Env-selectable
# so the two can be A/B'd on an idle chip (bench's frozen-grad field);
# contended-chip timings are too noisy to decide from (NEXT.md).
import os as _os

_BWD_IMPL = _os.environ.get("DPDIST_TABLE_BWD", "fold")


def table_gather_bwd(vox, grad, *, grid_size: int, k: int, dtype,
                     interpret: bool):
    if _BWD_IMPL == "transposed":
        return _table_gather_bwd_transposed(
            vox, grad, grid_size=grid_size, k=k, dtype=dtype,
            interpret=interpret)
    if _BWD_IMPL == "transposed_ng":
        return _table_gather_bwd_transposed_ng(
            vox, grad, grid_size=grid_size, k=k, dtype=dtype,
            interpret=interpret)
    return _table_gather_bwd_impl(vox, grad, grid_size=grid_size, k=k,
                                  dtype=dtype, interpret=interpret)


def _tg_bwd(grid_size, k, interpret, res, grad):
    proto, vox = res
    dfv = table_gather_bwd(vox, grad.astype(proto.dtype),
                           grid_size=grid_size, k=k,
                           dtype=proto.dtype, interpret=interpret)
    return (dfv, None)


_table_gather_diff.defvjp(_tg_fwd, _tg_bwd)


# ---------------------------------------------------------------------------
# Fused variant: voxel assignment + delta + [delta, emb] concat in-kernel
# ---------------------------------------------------------------------------

def _x_kernel(q_ref, fv_ref, out_ref, vox_out_ref, table_ref, *, g: int,
              k: int, C: int, V: int, dtype):
    """table_gather + the decoder-input assembly in one program:
    computes each query's voxel id and center-relative delta on the VPU
    (voxel_assign semantics: strict-lower/inclusive-upper cells, outside
    points read cell 0), then writes x = [delta, patch] directly — the
    (B, N, 3+E) decoder input never exists as an XLA concat copy.

    The query axis is tiled (grid minor axis): large N would blow the
    16 MB scoped-VMEM budget (measured: N=256 f32 needs 16.7 MB
    untiled); the patch table is built into the persistent scratch on
    the FIRST tile only and reused across the sequential tile steps."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        build_patch_table(fv_ref[0], table_ref, g=g, k=k, C=C, V=V)

    q = q_ref[0]                                       # (T, 3) f32
    step = 2.0 / g
    u = (q + 1.0) / step
    idx = jnp.ceil(u).astype(jnp.int32) - 1            # (T, 3)
    inside = jnp.all((u > 0.0) & (idx <= g - 1), axis=-1)  # (T,)
    idx = jnp.clip(idx, 0, g - 1)
    idx = jnp.where(inside[:, None], idx, 0)           # outside -> cell 0
    vox = idx[:, 1] * (g * g) + idx[:, 0] * g + idx[:, 2]
    centers = (idx.astype(jnp.float32) + 0.5) * step - 1.0
    delta = q - centers                                # == q - centers[vox]

    emb = gather_rows(table_ref, vox, V=V, dtype=dtype)
    out_ref[0, :, :3] = delta.astype(dtype)
    out_ref[0, :, 3:] = emb.astype(dtype)
    vox_out_ref[0, 0] = vox


def _table_gather_x_impl(fv, queries, *, grid_size: int, k: int,
                         interpret: bool):
    B, V, C = fv.shape
    N = queries.shape[1]
    g = grid_size
    assert V == g ** 3, (V, g)
    E = k ** 3 * C
    dtype = fv.dtype
    # Query-axis tile: keep blocks + scratch + intermediates within the
    # 16 MB scoped-VMEM budget (the (T, 3+E) out block dominates).
    tile = int(min(max(8, -(-N // 8) * 8), 128))
    nt = -(-N // tile)
    Np = nt * tile
    q = queries.astype(jnp.float32)
    if Np != N:
        q = jnp.concatenate(
            [q, jnp.zeros((B, Np - N, 3), q.dtype)], axis=1)
    kernel = functools.partial(_x_kernel, g=g, k=k, C=C, V=V, dtype=dtype)
    x, vox = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, 3 + E), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, 3 + E), dtype),
            jax.ShapeDtypeStruct((B, 1, Np), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((V, E), dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * V * E,
            bytes_accessed=B * (V * C + N * (3 + E)) * fv.dtype.itemsize,
            transcendentals=0,
        ),
    )(q, fv)
    if Np != N:
        x = x[:, :N]
        vox = vox[:, :, :N]
    return x, vox


def table_gather_x(fv, queries, grid_size: int, k: int,
                   interpret: bool = False):
    """(B, V, C) fv + (B, N, 3) queries -> (B, N, 3 + k^3*C) decoder input
    x = [delta, patch] (voxel_assign + gather + concat fused in VMEM).

    Differentiable in fv (Pallas transposed kernel) AND queries
    (d delta/d q = I within a cell; the cell assignment is piecewise
    constant, matching the XLA path's gradient). The inside-grid mask is
    NOT returned — compute it with voxel_assign (its vox/delta outputs
    dead-code-eliminate when only the mask is consumed).
    """
    if not interpret:
        from dpdist_tpu.ops.threedmfv import _on_tpu

        interpret = not _on_tpu()
    return _table_gather_x_diff(fv, queries, grid_size, k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _table_gather_x_diff(fv, queries, grid_size: int, k: int,
                         interpret: bool):
    x, _ = _table_gather_x_impl(fv, queries, grid_size=grid_size, k=k,
                                interpret=interpret)
    return x


def _tg_x_fwd(fv, queries, grid_size, k, interpret):
    x, vox = _table_gather_x_impl(fv, queries, grid_size=grid_size, k=k,
                                  interpret=interpret)
    # residuals must be JAX values: 0-d protos carry the primal dtypes
    return x, (jnp.zeros((), fv.dtype), vox[:, 0, :],
               jnp.zeros((), queries.dtype))


def _tg_x_bwd(grid_size, k, interpret, res, grad):
    proto, vox, q_proto = res
    dq = grad[..., :3].astype(q_proto.dtype)
    dfv = table_gather_bwd(vox, grad[..., 3:].astype(proto.dtype),
                           grid_size=grid_size, k=k,
                           dtype=proto.dtype, interpret=interpret)
    return (dfv, dq)


_table_gather_x_diff.defvjp(_tg_x_fwd, _tg_x_bwd)


def table_gather_bwd_xla_oracle(vox, grad, *, grid_size: int, k: int, dtype):
    """The previous XLA-re-derived backward, kept as the test oracle for
    the Pallas backward kernel (tight-tolerance parity asserted in
    tests/test_kernels.py — summation order differs where several queries
    share a voxel, so bwd parity is 1e-5-tight rather than bit-exact)."""
    B = vox.shape[0]
    V = grid_size ** 3
    C = grad.shape[-1] // k ** 3
    from dpdist_tpu.ops.voxel import extract_patches, gather_patches

    def xla_ref(fv):
        table = extract_patches(fv, grid_size, k)
        return gather_patches(table, vox, None)

    _, vjp = jax.vjp(xla_ref, jnp.zeros((B, V, C), dtype))
    return vjp(grad.astype(dtype))[0]
