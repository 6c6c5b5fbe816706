"""Fully-fused DPDist front half: points -> decoder input, one kernel.

Round-5 attack on the bf16 forward gap (RESULTS.md roofline: of the
9.9 ms bf16 forward at B=256/np=64, ~2.8 ms is the f32 XLA 3DmFV encode
and ~1.5 ms is voxel-assign/concat/dispatch glue — together ~43%, while
the decoder+gather matmuls are already at the MXU's speed of light).

One program per batch element performs, entirely in VMEM:
  1. the 3DmFV encode of the *encoded* cloud (exact f32 VPU
     responsibilities, same math as kernels/threedmfv_pallas.py;
     reference: get_3dmfv_tf, utils/dpdist_util.py:22-141), including the
     power + L2 finalize that previously ran as XLA ops;
  2. the k^3 patch-table build in a LANES-MAJOR (E, V) layout: the encode
     naturally emits fv as (C=20 rows, V=512 lanes), so each of the k^3
     slabs is a full-lane-width lane-shifted masked copy from a
     lane-padded scratch — no 4-D reshape, no transpose, no (V, C=20)
     16%-lane-utilization writes (the forward analog of the round-4
     V-in-lanes backward, kernels/table_gather_pallas.py:_lanes_fold);
  3. the queries' voxel assignment + cell-center delta (voxel_assign
     semantics: strict-lower/inclusive-upper cells, outside -> cell 0;
     reference mask construction dpdist_util.py:478-488);
  4. the one-hot MXU gather (E, V) @ (V, N) and the [delta; patch]
     assembly, emitted transposed as x^T (3+E, N) — the cheap (B, 3+E, N)
     -> (B, N, 3+E) relayout is left to XLA, which fuses it into the
     decoder's first matmul.

HBM traffic per direction: points + queries in, x out. The FV volume,
the patch table, and every 3DmFV intermediate never leave VMEM.

Differentiable in both clouds: the custom VJP recomputes the encode
through the XLA formulation (ops/threedmfv.py) and reuses the Pallas
table backward (table_gather_bwd) — the same composition the unfused
path differentiates through, so training-path gradients are unchanged.

Constraints (canonical config satisfies all): D == 3, full_fv normalized
3DmFV, G == grid_size^3, and N_queries <= 128 (one query tile; larger N
takes the two-kernel table path, which tiles).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpdist_tpu.ops.threedmfv import threedmfv_grid
from dpdist_tpu.kernels.table_gather_pallas import table_gather_bwd

_NEG = -3.4e38  # python literals: pallas kernels may not capture arrays
_POS = 3.4e38


def _encode_fv20(pts, mu, *, G: int, sigma: float, n_real: int):
    """(Mp, 3) points + (3, G) centers -> finalized (20, G) f32 FV.

    Same math as threedmfv_pallas._kernel (single tile, bt=1) with the
    finalize (mean divide, signed-sqrt power norm, per-channel L2 over G)
    folded in. Channel rows: [pi_mean, pi_max, mu_mean(3), mu_max(3),
    mu_min(3), sig_mean(3), sig_max(3), sig_min(3)].
    """
    Mp = pts.shape[0]
    w = 1.0 / G
    sw = np.sqrt(w)
    sw2 = np.sqrt(2.0 * w)

    diffs = []
    d2 = jnp.zeros((Mp, G), jnp.float32)
    for d in range(3):
        dd = (pts[:, d:d + 1] - mu[d:d + 1, :]) / sigma     # (Mp, G)
        diffs.append(dd)
        d2 = d2 + dd * dd
    logits = -0.5 * d2
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    Q = e / jnp.sum(e, axis=1, keepdims=True)               # (Mp, G)

    row = jax.lax.broadcasted_iota(jnp.int32, (Mp, G), 0)
    valid = row < n_real
    Q = jnp.where(valid, Q, 0.0)
    d_pi = jnp.where(valid, (Q - w) / (sw * n_real), 0.0)

    mu_t, sig_t = [], []
    for d in range(3):
        mu_t.append(Q * diffs[d])                           # Q already masked
        sig_t.append(Q * (diffs[d] * diffs[d] - 1.0))

    def s_of(t, scale):
        return jnp.sum(t, axis=0, keepdims=True) / scale

    def mx_of(t, scale):
        return jnp.max(jnp.where(valid, t, _NEG), axis=0, keepdims=True) / scale

    def mn_of(t, scale):
        return jnp.min(jnp.where(valid, t, _POS), axis=0, keepdims=True) / scale

    channels = [s_of(d_pi, 1.0), mx_of(d_pi, 1.0)]
    channels += [s_of(t, sw) for t in mu_t]
    channels += [mx_of(t, sw) for t in mu_t]
    channels += [mn_of(t, sw) for t in mu_t]
    channels += [s_of(t, sw2) for t in sig_t]
    channels += [mx_of(t, sw2) for t in sig_t]
    channels += [mn_of(t, sw2) for t in sig_t]
    fv = jnp.concatenate(channels, axis=0)                  # (20, G)

    # Finalize. Mean rows {0, 2-4, 11-13} were accumulated as sums.
    r = jax.lax.broadcasted_iota(jnp.int32, (20, 1), 0)
    is_mean = (r == 0) | ((r >= 2) & (r <= 4)) | ((r >= 11) & (r <= 13))
    fv = fv * jnp.where(is_mean, 1.0 / n_real, 1.0)
    eps = 1e-12
    fv = jnp.sign(fv) * jnp.sqrt(jnp.maximum(jnp.abs(fv), eps))
    n2 = jnp.sum(fv * fv, axis=1, keepdims=True)
    return fv * jax.lax.rsqrt(jnp.maximum(n2, eps))


def _build_table_lanes(fv20, fvpad_ref, table_ref, *, g: int, k: int,
                       C: int, V: int, HALO: int):
    """(C, V) fv -> (E, V) patch table, both lanes-major, via k^3
    full-width lane-shifted masked slab copies (the forward analog of
    _lanes_fold): table^T[o*C + c, v] = fv^T[c, v + off_o] where
    off_o = (di-kh)*g^2 + (dj-kh)*g + (dl-kh), masked where any shifted
    grid coordinate leaves [0, g)."""
    kh = k // 2
    fvpad_ref[:, :HALO] = jnp.zeros((C, HALO), jnp.float32)
    fvpad_ref[:, HALO + V:] = jnp.zeros((C, HALO), jnp.float32)
    fvpad_ref[:, HALO:HALO + V] = fv20
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    vx, vy, vz = lane // (g * g), (lane // g) % g, lane % g
    o = 0
    for di in range(k):
        for dj in range(k):
            for dl in range(k):
                sx, sy, sz = di - kh, dj - kh, dl - kh
                off = sx * g * g + sy * g + sz
                m = ((vx + sx >= 0) & (vx + sx < g)
                     & (vy + sy >= 0) & (vy + sy < g)
                     & (vz + sz >= 0) & (vz + sz < g))
                slab = fvpad_ref[:, HALO + off:HALO + off + V]
                table_ref[o * C:(o + 1) * C, :] = jnp.where(m, slab, 0.0)
                o += 1


def _mfv_x_kernel(pts_ref, qT_ref, mu_ref, xT_ref, vox_out_ref, fvpad_ref,
                  table_ref, *, g: int, k: int, C: int, V: int, G: int,
                  HALO: int, sigma: float, n_real: int, dtype):
    fv20 = _encode_fv20(pts_ref[0], mu_ref[:], G=G, sigma=sigma,
                        n_real=n_real)
    _build_table_lanes(fv20, fvpad_ref, table_ref, g=g, k=k, C=C, V=V,
                       HALO=HALO)

    # Queries: voxel assignment + delta, row-wise on the (3, Nq) layout
    # (exact mirror of table_gather_pallas._x_kernel / ops.voxel_assign).
    qT = qT_ref[0]                                          # (3, Nq)
    step = 2.0 / g
    u = (qT + 1.0) / step
    idx = jnp.ceil(u).astype(jnp.int32) - 1                 # (3, Nq)
    inside = jnp.all((u > 0.0) & (idx <= g - 1), axis=0)    # (Nq,)
    idx = jnp.clip(idx, 0, g - 1)
    idx = jnp.where(inside[None, :], idx, 0)                # outside -> cell 0
    vox = idx[1] * (g * g) + idx[0] * g + idx[2]            # (Nq,)
    centers = (idx.astype(jnp.float32) + 0.5) * step - 1.0
    deltaT = qT - centers                                   # (3, Nq)

    Nq = vox.shape[0]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (V, Nq), 0)
    onehot = (vox[None, :] == iota_v).astype(dtype)         # (V, Nq)
    tb = table_ref[:]
    if dtype != jnp.float32:
        tb = tb.astype(dtype)
    embT = jnp.dot(tb, onehot, preferred_element_type=jnp.float32)
    xT_ref[0, :3, :] = deltaT.astype(dtype)
    xT_ref[0, 3:, :] = embT.astype(dtype)
    vox_out_ref[0, 0] = vox


def _mfv_x_impl(points, queries, *, n_gaussians: int, sigma: float,
                grid_size: int, k: int, dtype, interpret: bool):
    B, M, D = points.shape
    N = queries.shape[1]
    g = grid_size
    G = n_gaussians
    V = g ** 3
    assert D == 3 and V == G, (D, V, G)
    assert N <= 128, "one query tile only; use the table path for large N"
    C = 20
    E = k ** 3 * C
    kh = k // 2
    HALO = kh * (g * g + g + 1)
    dtype = jnp.dtype(dtype)

    mu = np.ascontiguousarray(threedmfv_grid(G, 3).T)        # (3, G)
    Mp = -(-M // 8) * 8
    pts = points.astype(jnp.float32)
    if Mp != M:
        pts = jnp.concatenate(
            [pts, jnp.zeros((B, Mp - M, 3), jnp.float32)], axis=1)
    Np = -(-N // 8) * 8
    qT = jnp.swapaxes(queries.astype(jnp.float32), 1, 2)     # (B, 3, N)
    if Np != N:
        qT = jnp.concatenate(
            [qT, jnp.zeros((B, 3, Np - N), jnp.float32)], axis=2)

    kernel = functools.partial(
        _mfv_x_kernel, g=g, k=k, C=C, V=V, G=G, HALO=HALO,
        sigma=float(sigma), n_real=M, dtype=dtype)
    xT, vox = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Mp, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, G), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3 + E, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 3 + E, Np), dtype),
            jax.ShapeDtypeStruct((B, 1, Np), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, V + 2 * HALO), jnp.float32),
            pltpu.VMEM((E, V), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * V * E + 8 * B * M * G,
            bytes_accessed=B * ((M + N) * 3 * 4
                                + N * (3 + E) * dtype.itemsize),
            transcendentals=B * M * G,
        ),
    )(pts, qT, jnp.asarray(mu, jnp.float32))
    x = jnp.swapaxes(xT, 1, 2)                               # (B, Np, 3+E)
    if Np != N:
        x = x[:, :N]
        vox = vox[:, :, :N]
    return x, vox[:, 0, :]


def mfv_table_gather_x(points, queries, n_gaussians: int, sigma: float,
                       grid_size: int, k: int, dtype=jnp.float32,
                       interpret: bool = False):
    """(B, M, 3) encoded cloud + (B, N, 3) queries -> (B, N, 3 + k^3*20)
    decoder input x = [delta, patch] in `dtype`, with the 3DmFV encode,
    patch-table build, voxel assignment, and gather fused in VMEM.

    Equivalent (to encode-math tolerance, ~1e-5 after normalization) to
      fv = threedmfv(points, n_gaussians, sigma).astype(dtype)
      x  = table_gather_x(fv, queries, grid_size, k)
    Differentiable in points AND queries (custom VJP through the XLA
    encode + the Pallas table backward). The inside-grid mask is NOT
    returned — compute it with voxel_assign (dead-code-eliminates to the
    mask alone).
    """
    if not interpret:
        from dpdist_tpu.ops.threedmfv import _on_tpu

        interpret = not _on_tpu()
    return _mfv_x_diff(points, queries, n_gaussians, float(sigma),
                       grid_size, k, jnp.dtype(dtype).name, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _mfv_x_diff(points, queries, n_gaussians, sigma, grid_size, k,
                dtype_name, interpret):
    x, _ = _mfv_x_impl(points, queries, n_gaussians=n_gaussians,
                       sigma=sigma, grid_size=grid_size, k=k,
                       dtype=dtype_name, interpret=interpret)
    return x


def _mfv_x_fwd(points, queries, n_gaussians, sigma, grid_size, k,
               dtype_name, interpret):
    x, vox = _mfv_x_impl(points, queries, n_gaussians=n_gaussians,
                         sigma=sigma, grid_size=grid_size, k=k,
                         dtype=dtype_name, interpret=interpret)
    return x, (points, vox, jnp.zeros((), queries.dtype))


def _mfv_x_bwd(n_gaussians, sigma, grid_size, k, dtype_name, interpret,
               res, grad):
    from dpdist_tpu.ops.threedmfv import threedmfv

    points, vox, q_proto = res
    dtype = jnp.dtype(dtype_name)
    dq = grad[..., :3].astype(q_proto.dtype)
    dfv = table_gather_bwd(vox, grad[..., 3:].astype(dtype),
                           grid_size=grid_size, k=k, dtype=dtype,
                           interpret=interpret)
    _, vjp = jax.vjp(
        lambda p: threedmfv(p, n_gaussians, sigma, impl="xla").astype(dtype),
        points)
    dpoints = vjp(dfv)[0]
    return (dpoints, dq)


_mfv_x_diff.defvjp(_mfv_x_fwd, _mfv_x_bwd)
