"""Fully fused DPDist eval forward: patch table + gather + decoder MLP in
one Pallas kernel, per cloud, entirely in VMEM.

MEASURED RESULT (v5e, bf16): throughput-neutral vs the composed
table-kernel path at every tested shape — (B=256, N=64) 9.94 vs 9.93 ms,
(256, 256) 20.1 vs 20.4 ms, (64, 1024) 14.9 vs 14.8 ms. The composed
path's emb round-trip it eliminates is small relative to the gather +
decoder FLOPs, and XLA already batches the decoder over all 2B*N rows
(full MXU row utilization) where this kernel works M=N rows per program.
Kept for the regime it was built for — minimum-latency small-batch
serving, where one kernel launch replaces the composed graph's several —
and as the reference implementation of a whole-model-in-VMEM forward.

The decoder path's HBM traffic in the composed graph is the gathered
patch matrix (B, N, k^3*C) written then re-read by the first MLP layer
(~164 MB at B=256), plus inter-layer activations. Here a single program
per cloud:
  1. builds the (V, k^3*C) patch table in a VMEM scratch from the 40 KB
     FV volume (extract_patches construction, SAME zero padding);
  2. one-hot gathers the query rows on the MXU (full-lane-width matmul);
  3. runs the whole conv_version=1 decoder (mlp widths + linear output)
     with the first layer SPLIT as emb @ W1[3:] + delta @ W1[:3] — the
     [delta, patch] concat (dpdist_util.py:434-457,513-547) never exists.
HBM traffic per cloud: fv + queries in, (N, out) out. Weights live in
VMEM via constant-index blocks (loaded once, revisited across the grid).

bf16 only: the resident weight set (W1 2500x1024 + 2x 1024^2) plus the
table exceeds 16 MB VMEM in f32. Matmuls accumulate in f32
(preferred_element_type) and round to bf16 between layers — the same
numerics class as the composed bf16 path (cfg.dtype='bfloat16').

Eval-only: gradients fall back to the composed XLA path at the call site
(apply_dpdist routes here only under train=False with no grad needed —
the op defines no VJP on purpose, so accidental differentiation is a
loud error rather than a silent slow path).

Reference semantics: dpdist_util.py DPDist conv_version=1 (:513-547)
with the relu6/3 head and mask applied by the caller (:688-698).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(vox_ref, delta_ref, fv_ref, w1d_ref, w1e_ref, b1_ref,
            *wb_refs, out_ref=None, table_ref=None,
            g: int, k: int, C: int, V: int, n_hidden: int):
    from dpdist_tpu.kernels.table_gather_pallas import build_table_and_gather

    dtype = fv_ref.dtype
    emb = build_table_and_gather(fv_ref[0], vox_ref[0, 0], table_ref,
                                 g=g, k=k, C=C, V=V, dtype=dtype)  # (N, E)

    # First layer with the [delta, emb] concat algebraically split.
    delta = delta_ref[0].astype(dtype)                 # (N, 3)
    h = (jnp.dot(emb.astype(dtype), w1e_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(delta, w1d_ref[:],
                   preferred_element_type=jnp.float32)
         + b1_ref[:].astype(jnp.float32))
    h = jnp.maximum(h, 0.0)

    for i in range(n_hidden):
        w_ref, b_ref = wb_refs[2 * i], wb_refs[2 * i + 1]
        h = (jnp.dot(h.astype(dtype), w_ref[:],
                     preferred_element_type=jnp.float32)
             + b_ref[:].astype(jnp.float32))
        if i < n_hidden - 1:
            h = jnp.maximum(h, 0.0)
    out_ref[0] = h                                     # linear head, f32


@functools.partial(jax.jit, static_argnames=("grid_size", "k", "interpret"))
def fused_forward(fv, vox, delta, layers, grid_size: int, k: int,
                  interpret: bool = False):
    """(B,V,C) fv + (B,N) vox + (B,N,3) delta + decoder layers ->
    (B, N, out) pre-activation decoder output (mask/relu6 at the caller).

    layers: list of {"w","b"} with layer 0 consuming [delta(3), patch(E)].
    Not differentiable (eval path; see module docstring).
    """
    B, V, C = fv.shape
    N = vox.shape[1]
    g = grid_size
    E = k ** 3 * C
    dtype = fv.dtype
    w1 = layers[0]["w"].astype(dtype)
    w1d, w1e = w1[:3], w1[3:]
    b1 = layers[0]["b"].reshape(1, -1).astype(dtype)
    rest = []
    for lp in layers[1:]:
        rest.append(lp["w"].astype(dtype))
        rest.append(lp["b"].reshape(1, -1).astype(dtype))
    out_dim = layers[-1]["b"].shape[0]
    n_hidden = len(layers) - 1

    const = lambda b: (0, 0)  # noqa: E731  (weights: same block every step)
    kernel = functools.partial(_kernel, g=g, k=k, C=C, V=V,
                               n_hidden=n_hidden)

    def kern(*refs):
        # pallas passes refs positionally; rebind keyword-only outs.
        n_in = 6 + 2 * n_hidden
        kernel(*refs[:n_in], out_ref=refs[n_in], table_ref=refs[n_in + 1])

    in_specs = [
        pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, V, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1d.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(w1e.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(b1.shape, const, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(r.shape, const, memory_space=pltpu.VMEM) for r in rest]

    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, out_dim), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, out_dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((V, E), dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (V * E + (E + 3) * w1.shape[1]
                               + sum(r.shape[0] * r.shape[1]
                                     for r in rest[::2])),
            bytes_accessed=B * (V * C + N * (3 + out_dim)) * 4,
            transcendentals=0,
        ),
    )(vox[:, None, :], delta, fv, w1d, w1e, b1, *rest)
