#!/usr/bin/env python3
"""Measure the baseline denominator for bench.py's vs_baseline.

The reference publishes no numbers (BASELINE.md), and its TF1+CUDA stack
cannot run in this environment, so the denominator is produced by TIMING
THE LITERAL REFERENCE MATH on this host: the numpy re-execution of the
reference's full bidirectional forward graph (the same oracle code the
golden tests trust, tests/oracles.py) at the reference's canonical config
— batch 16, np=64, 512 gaussians, K=5, MLP 1024^3
(train_multi_gpu_pc_compare_dist.py:41-69 defaults + run_train.bash:4).

numpy runs on top of the same multi-threaded BLAS TF1's CPU backend uses,
so this is a fair floor for "the reference graph executed on this host".
It is NOT a GPU measurement; BASELINE.md documents both this number and
the 2020-era GPU estimate.

Prints one JSON line:
  {"pairs_per_sec": ..., "ms_per_step": ..., "batch": 16, "iters": N}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from oracles import (  # noqa: E402
    extract_volume_patches_oracle,
    grid_binary_mask_oracle,
    threedmfv_oracle,
)


def reference_forward(pcA, pcB, weights, centers, *, sigma=0.125, k=5,
                      n_gaussians=512):
    """One full reference forward: get_model (models/dpdist_and_aue.py:31-86)
    re-executed in numpy — 3DmFV encode both clouds (dpdist_util.py:22-141),
    k^3 volume patches (:911-960), voxel mask + gather + concat (:434-492),
    2B-batch implicit MLP 1024^3 -> 3 with relu6/3 head and mask zeroing
    (:511-547, :688-698)."""
    B, N, _ = pcA.shape
    g = round(n_gaussians ** (1 / 3))

    embA = threedmfv_oracle(pcA, n_gaussians, sigma)           # B,V,20
    embB = threedmfv_oracle(pcB, n_gaussians, sigma)
    C = embA.shape[2]

    # local_z: k^3 volume patches over the 8^3 grid
    patA = extract_volume_patches_oracle(
        embA.reshape(B, g, g, g, C), k).reshape(B, n_gaussians, -1)
    patB = extract_volume_patches_oracle(
        embB.reshape(B, g, g, g, C), k).reshape(B, n_gaussians, -1)

    # voxel membership of the OTHER cloud's query points + gather_nd
    maskB, relB, argB = grid_binary_mask_oracle(centers, pcB)   # queries B vs emb A
    maskA, relA, argA = grid_binary_mask_oracle(centers, pcA)   # queries A vs emb B
    E = patA.shape[-1]

    def gather_concat(pat, rel, arg):
        out = np.empty((B, N, E + 3), np.float32)
        for b in range(B):
            out[b, :, :E] = pat[b, arg[b]]
            out[b, :, E:] = rel[b, np.arange(N), arg[b]]
        return out

    xAB = gather_concat(patA, relB, argB)
    xBA = gather_concat(patB, relA, argA)
    x = np.concatenate([xAB, xBA], 0).reshape(2 * B * N, E + 3)

    # conv_version=1 MLP: 1x1 convs == matmuls (dpdist_util.py:513-547)
    h = x
    for W, bias in weights[:-1]:
        h = np.maximum(h @ W + bias, 0.0)
    W, bias = weights[-1]
    h = h @ W + bias
    h = np.minimum(np.maximum(h, 0.0), 6.0) / 3.0               # relu6/3 (:690)
    h = h.reshape(2, B, N, 3)
    m = np.stack([maskB.max(2), maskA.max(2)], 0)[..., None]    # zero off-grid (:697)
    return h * m


def main():
    B, N, sigma, k, n_gaussians = 16, 64, 0.125, 5, 512
    mlp = (1024, 1024, 1024, 3)
    rng = np.random.default_rng(0)

    g = round(n_gaussians ** (1 / 3))
    l = np.linspace(-1, 1, g, False) + 1 / g
    x, y, z = np.meshgrid(l, l, l)
    centers = np.stack([x.flatten(), y.flatten(), z.flatten()]).T

    E = k ** 3 * 20
    dims = (E + 3,) + mlp
    weights = [
        (rng.normal(0, (2 / dims[i]) ** 0.5, (dims[i], dims[i + 1])).astype(np.float32),
         np.zeros(dims[i + 1], np.float32))
        for i in range(len(mlp))
    ]

    pcA = rng.uniform(-0.8, 0.8, (B, N, 3)).astype(np.float32)
    pcB = rng.uniform(-0.8, 0.8, (B, N, 3)).astype(np.float32)

    reference_forward(pcA, pcB, weights, centers, sigma=sigma, k=k,
                      n_gaussians=n_gaussians)  # warm BLAS/thread pools
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = reference_forward(pcA, pcB, weights, centers, sigma=sigma,
                                k=k, n_gaussians=n_gaussians)
    dt = time.perf_counter() - t0
    assert np.isfinite(out).all()
    print(json.dumps({
        "pairs_per_sec": round(B * iters / dt, 2),
        "ms_per_step": round(1000 * dt / iters, 2),
        "batch": B,
        "iters": iters,
    }))


if __name__ == "__main__":
    main()
