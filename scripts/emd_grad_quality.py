#!/usr/bin/env python3
"""Diagnose Sinkhorn-EMD gradient quality for registration supervision.

EMD-supervised PCRNet underperformed in round 1 (22.2 deg mean rot err vs
chamfer's 3.7 — VERDICT weak #2). The suspect is the gradient of
ops/emd.py's annealed Sinkhorn vs the reference's CUDA auction matcher
(tf_util_loss.py:42-47). This sweeps (iters, eps_start, eps_end) and
scores each setting by the cosine similarity between the Sinkhorn EMD
gradient w.r.t. the source points and the EXACT-assignment EMD gradient
(scipy Hungarian, the asymptotic auction result), over random registration
poses — the regime PCRNet trains in.

Run on CPU: python scripts/emd_grad_quality.py
"""

import itertools
import json

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from scipy.optimize import linear_sum_assignment  # noqa: E402
from scipy.spatial.distance import cdist  # noqa: E402

from dpdist_tpu.data.registration import RegistrationDataset  # noqa: E402
from dpdist_tpu.ops.emd import sinkhorn_emd  # noqa: E402


def exact_grad(src, tmpl):
    """d/d src of sum_n ||src_n - tmpl_pi(n)|| / N at the optimal assignment
    (envelope theorem — the same semantics the CUDA op uses)."""
    D = cdist(src, tmpl)
    r, c = linear_sum_assignment(D)
    diff = src[r] - tmpl[c]
    g = np.zeros_like(src)
    g[r] = diff / (np.linalg.norm(diff, axis=1, keepdims=True) + 1e-12) / len(src)
    return g, D[r, c].mean()


def main():
    ds = RegistrationDataset(n_templates=8, num_point=64, seed=0)
    tmpl, src, _ = ds.sample_batch(16)

    cases = []
    for iters, eps_start, eps_end in itertools.product(
            (50, 100, 200), (0.5, 0.1), (0.05, 0.02, 0.01, 0.002)):

        def emd_sum(s):
            return jnp.sum(sinkhorn_emd(s, jnp.asarray(tmpl), iters,
                                        eps_start, eps_end))

        g_sink = np.asarray(jax.grad(emd_sum)(jnp.asarray(src)))
        cos, val_err = [], []
        for b in range(len(src)):
            g_ex, emd_ex = exact_grad(src[b], tmpl[b])
            num = (g_sink[b] * g_ex).sum()
            den = np.linalg.norm(g_sink[b]) * np.linalg.norm(g_ex) + 1e-12
            cos.append(num / den)
            val = float(sinkhorn_emd(jnp.asarray(src[b:b + 1]),
                                     jnp.asarray(tmpl[b:b + 1]), iters,
                                     eps_start, eps_end)[0])
            val_err.append(abs(val - emd_ex) / emd_ex)
        cases.append({
            "iters": iters, "eps_start": eps_start, "eps_end": eps_end,
            "grad_cosine_mean": round(float(np.mean(cos)), 4),
            "grad_cosine_min": round(float(np.min(cos)), 4),
            "value_rel_err": round(float(np.mean(val_err)), 4),
        })
        print(json.dumps(cases[-1]))

    best = max(cases, key=lambda c: c["grad_cosine_mean"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
