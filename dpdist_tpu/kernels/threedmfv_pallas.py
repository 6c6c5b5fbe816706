"""Fused Pallas TPU kernel for the 3DmFV encoder (SURVEY N3).

The kernel streams point tiles and accumulates all 20 pooled derivative
channels in VMEM without materializing the (B, N, G, D) derivative
tensors in HBM: per tile it computes Gaussian responsibilities
(softmax over exact VPU squared distances — the MXU's bf16 multiply is
not accurate enough for logits scaled by 1/(2 sigma^2)), forms the
d_pi / d_mu / d_sigma terms, and folds them into running sum/max/min
accumulators. Traffic per cloud: N x 3 in + 20 x G out, independent of N.

The cheap tail (power + L2 normalization over G, transpose to (G, 20))
runs as ordinary XLA ops on the (B, 20, G) kernel output.

Grid: (B, num_point_tiles); the point-tile axis is minor-most, so TPU's
sequential grid execution makes the revisited output block a legal
accumulator (@pl.when(first tile) initializes it).

Reference math: get_3dmfv_tf (utils/dpdist_util.py:22-141); numerics
match ops.threedmfv.threedmfv (softmax formulation).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpdist_tpu.ops.threedmfv import threedmfv_grid

_NEG = -3.4e38  # python literals: pallas kernels may not capture arrays
_POS = 3.4e38


def _kernel(points_ref, mu_ref, out_ref, *, G: int, sigma: float,
            n_real: int, tile: int, bt: int):
    t_idx = pl.program_id(1)
    pts = points_ref[:].reshape(bt * tile, 3)             # (R, 3), R = bt*T
    mu = mu_ref[:]                                        # (3, G)
    R = bt * tile
    w = 1.0 / G
    sw = np.sqrt(w)
    sw2 = np.sqrt(2.0 * w)

    # Exact squared distances on the VPU, one dimension at a time.
    diffs = []
    d2 = jnp.zeros((R, G), jnp.float32)
    for d in range(3):
        dd = (pts[:, d:d + 1] - mu[d:d + 1, :]) / sigma   # (R, G)
        diffs.append(dd)
        d2 = d2 + dd * dd
    logits = -0.5 * d2

    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    Q = e / jnp.sum(e, axis=1, keepdims=True)             # (R, G)

    # Mask padding rows: within-cloud point index >= n_real.
    row = jax.lax.broadcasted_iota(jnp.int32, (R, G), 0)
    pt_idx = row % tile + t_idx * tile
    valid = pt_idx < n_real
    Q = jnp.where(valid, Q, 0.0)

    # d_pi channels: mean, max of (Q - w)/(sqrt(w) N)
    d_pi = jnp.where(valid, (Q - w) / (sw * n_real), 0.0)

    mu_t, sig_t = [], []
    for d in range(3):
        t = Q * diffs[d]                                   # Q already masked
        mu_t.append(t)
        sig_t.append(Q * (diffs[d] * diffs[d] - 1.0))

    # Per-cloud pooling: reshape (R, G) -> (bt, T, G), reduce the T axis.
    def s_of(t, scale):
        return jnp.sum(t.reshape(bt, tile, G), axis=1) / scale

    def mx_of(t, scale):
        return jnp.max(jnp.where(valid, t, _NEG).reshape(bt, tile, G),
                       axis=1) / scale

    def mn_of(t, scale):
        return jnp.min(jnp.where(valid, t, _POS).reshape(bt, tile, G),
                       axis=1) / scale

    # Channel layout of the (bt, 20, G) accumulator (contiguous groups):
    #   0: pi_sum        1: pi_max
    #   2-4: mu_sum      5-7: mu_max     8-10: mu_min
    #   11-13: sig_sum   14-16: sig_max  17-19: sig_min
    channels = [s_of(d_pi, 1.0), mx_of(d_pi, 1.0)]
    channels += [s_of(t, sw) for t in mu_t]
    channels += [mx_of(t, sw) for t in mu_t]
    channels += [mn_of(t, sw) for t in mu_t]
    channels += [s_of(t, sw2) for t in sig_t]
    channels += [mx_of(t, sw2) for t in sig_t]
    channels += [mn_of(t, sw2) for t in sig_t]
    part = jnp.stack(channels, axis=1)                     # (bt, 20, G)

    @pl.when(t_idx == 0)
    def _():
        out_ref[:] = part

    @pl.when(t_idx > 0)
    def _():
        acc = out_ref[:]
        p = part
        merged = jnp.concatenate([
            acc[:, 0:1] + p[:, 0:1],
            jnp.maximum(acc[:, 1:2], p[:, 1:2]),
            acc[:, 2:5] + p[:, 2:5],
            jnp.maximum(acc[:, 5:8], p[:, 5:8]),
            jnp.minimum(acc[:, 8:11], p[:, 8:11]),
            acc[:, 11:14] + p[:, 11:14],
            jnp.maximum(acc[:, 14:17], p[:, 14:17]),
            jnp.minimum(acc[:, 17:20], p[:, 17:20]),
        ], axis=1)
        out_ref[:] = merged


def threedmfv_pallas(points, n_gaussians: int = 512, sigma: float = 0.125,
                     *, interpret: bool = False):
    """Fused 3DmFV: (B, N, 3) -> (B, G, 20). full_fv + normalize only.

    Semantics identical to ops.threedmfv.threedmfv(..., flatten=False,
    full_fv=True, normalize=True) for 3-D inputs. Differentiable: the
    backward pass runs through the XLA formulation (the kernel itself has
    no transpose rule), so frozen-DPDist losses can flow gradients into
    the encoded cloud at any N.

    A Pallas backward was considered and rejected (round 3): the max/min
    pools need XLA's tie-splitting gradient semantics (ties are COMMON —
    underflowed Q=0 rows tie at the -w/(sqrt(w)N) floor), which requires
    a second tie-counting streaming pass; and the kernel only dispatches
    at N>=128 while every reference workload trains at np=64 on the XLA
    path — the complexity would buy nothing on the benchmarked configs.
    """
    return _threedmfv_pallas_diff(points, n_gaussians, float(sigma), interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _threedmfv_pallas_diff(points, n_gaussians, sigma, interpret):
    return _threedmfv_pallas_impl(points, n_gaussians, sigma, interpret)


def _threedmfv_pallas_fwd(points, n_gaussians, sigma, interpret):
    return _threedmfv_pallas_impl(points, n_gaussians, sigma, interpret), points


def _threedmfv_pallas_bwd(n_gaussians, sigma, interpret, points, g):
    from dpdist_tpu.ops.threedmfv import threedmfv

    _, vjp = jax.vjp(
        lambda p: threedmfv(p, n_gaussians, sigma, impl="xla"), points
    )
    return vjp(g)


_threedmfv_pallas_diff.defvjp(_threedmfv_pallas_fwd, _threedmfv_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("n_gaussians", "sigma", "interpret"))
def _threedmfv_pallas_impl(points, n_gaussians: int = 512, sigma: float = 0.125,
                           interpret: bool = False):
    B, N, D = points.shape
    assert D == 3, "pallas kernel is 3-D only; use ops.threedmfv for 2-D"
    G = n_gaussians
    mu = np.ascontiguousarray(threedmfv_grid(G, 3).T)      # (3, G)

    # ~15 (bt*tile, G) fp32 intermediates stay live; bt*tile <= 256 keeps
    # the working set ~8 MB at G=512, inside the 16 MB VMEM budget.
    tile = int(min(max(8, -(-N // 8) * 8), 256))
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    if Np != N:
        pad = jnp.zeros((B, Np - N, 3), points.dtype)
        pts = jnp.concatenate([points, pad], axis=1)
    else:
        pts = points

    # Batch-tiling amortizes per-program overhead when N is small (the
    # canonical np=64 config would otherwise run B tiny programs).
    bt = int(max(1, min(B, 256 // tile)))
    Bp = -(-B // bt) * bt
    if Bp != B:
        pts = jnp.concatenate(
            [pts, jnp.zeros((Bp - B, Np, 3), pts.dtype)], axis=0)

    kernel = functools.partial(_kernel, G=G, sigma=float(sigma), n_real=N,
                               tile=tile, bt=bt)
    raw = pl.pallas_call(
        kernel,
        grid=(Bp // bt, n_tiles),
        in_specs=[
            pl.BlockSpec((bt, tile, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, G), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 20, G), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 20, G), jnp.float32),
        interpret=interpret,
    )(pts.astype(jnp.float32), jnp.asarray(mu, jnp.float32))
    raw = raw[:B]

    # Finalize: means were accumulated as sums; divide, then power + L2
    # normalize over G and lay out as (B, G, 20).
    mean_mask = jnp.asarray(
        [1, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0],
        jnp.float32,
    )[None, :, None]
    fv = raw * jnp.where(mean_mask > 0, 1.0 / N, 1.0)

    eps = 1e-12
    fv = jnp.sign(fv) * jnp.sqrt(jnp.maximum(jnp.abs(fv), eps))
    n2 = jnp.sum(fv * fv, axis=2, keepdims=True)
    fv = fv * jax.lax.rsqrt(jnp.maximum(n2, eps))
    return jnp.transpose(fv, (0, 2, 1))
