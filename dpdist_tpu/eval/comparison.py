"""Distance-comparison harness: DPDist vs chamfer vs EMD sensitivity.

The paper's core claim (README.md:7-9) is that the learned distance
responds to *surface* deviation rather than sampling noise: two different
samplings of the same surface should score ~0, while genuine geometric
perturbation should grow the distance monotonically. This harness
quantifies that on controlled perturbation sweeps — the experiment the
reference runs implicitly through training-time summaries
(train_multi_gpu_pc_compare_dist.py:466-469).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.models.dpdist import dpdist_distance
from dpdist_tpu.ops.chamfer import chamfer_distance
from dpdist_tpu.ops.emd import earth_mover_distance


def perturbation_sweep(params, state, cfg: DPDistConfig, surfaces,
                       *, kind: str = "deform",
                       magnitudes: Sequence[float] = (0.0, 0.02, 0.05, 0.1, 0.2),
                       num_point: int = 64, seed: int = 0) -> Dict:
    """Score cloud pairs under growing perturbation with all 3 metrics.

    Args:
      surfaces: (M, P, 3) dense surfaces (P >= 2*num_point). For each
        magnitude, pcA is one sampling, pcB an independent sampling
        perturbed by `kind`:
          'resample' : none (different sampling only; magnitude ignored)
          'noise'    : gaussian jitter of scale m
          'deform'   : low-frequency sinusoidal warp of amplitude m
          'translate': rigid shift by m along a random direction
          'occlude'  : kNN-ball removal + duplicate refill, fraction m

    Returns:
      {"magnitudes": [...], "dpdist": [...], "chamfer": [...], "emd": [...]}
      with per-magnitude mean scores.
    """
    rng = np.random.default_rng(seed)
    M, P, _ = surfaces.shape
    N = num_point

    @jax.jit
    def score(a, b):
        return (dpdist_distance(params, state, cfg, a, b),
                chamfer_distance(a, b),
                earth_mover_distance(a, b))

    out = {"magnitudes": list(magnitudes), "dpdist": [], "chamfer": [], "emd": []}
    for m in magnitudes:
        da, db, de = [], [], []
        for s in surfaces:
            idx = rng.permutation(P)
            pcA = s[idx[:N]]
            pcB = s[idx[N:2 * N]].copy()
            if kind == "noise":
                pcB = pcB + rng.normal(0, max(m, 1e-12), pcB.shape)
            elif kind == "deform":
                freq = 2.0 * np.pi
                pcB = pcB + m * np.sin(freq * pcB[:, [1, 2, 0]])
            elif kind == "translate":
                d = rng.normal(size=3)
                pcB = pcB + m * d / np.linalg.norm(d)
            elif kind == "occlude":
                # kNN-ball removal + duplicate refill (helper.add_occlusions
                # semantics): the occluded cloud still lies ON the surface,
                # so a surface distance should stay near its resample floor
                # while correspondence metrics (chamfer/EMD) read the
                # missing ball as geometric change.
                if m > 0:
                    from dpdist_tpu.data.registration import add_occlusions_np

                    pcB = add_occlusions_np(pcB[None].astype(np.float32),
                                            min(m, 0.95), rng)[0]
            elif kind != "resample":
                raise ValueError(f"unknown kind {kind!r}")
            r = score(jnp.asarray(pcA[None], jnp.float32),
                      jnp.asarray(pcB[None].astype(np.float32)))
            da.append(float(r[0]))
            db.append(float(r[1]))
            de.append(float(r[2]))
        out["dpdist"].append(float(np.mean(da)))
        out["chamfer"].append(float(np.mean(db)))
        out["emd"].append(float(np.mean(de)))
    return out


def monotonicity(values: Sequence[float]) -> float:
    """Fraction of consecutive increases — 1.0 means strictly responsive."""
    v = np.asarray(values)
    if len(v) < 2:
        return 1.0
    return float(np.mean(np.diff(v) > 0))
