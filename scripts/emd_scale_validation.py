#!/usr/bin/env python3
"""Validate Sinkhorn EMD at the reference's operating scales (VERDICT r3
next-#5): N = 64, 256, 1024 — the CUDA approx_match the Sinkhorn replaces
is exercised by the reference up to --num_point 1024
(iterative_PCRNet.py:35, tf_util_loss.py:42-47).

Per N, over registration-pose pairs:
  * value_rel_err: |sinkhorn - exact| / exact, exact = Hungarian
    assignment cost (scipy linear_sum_assignment), the asymptotic
    auction-matcher result;
  * grad_cosine: cosine between d EMD/d src from the Sinkhorn custom VJP
    and the exact-assignment envelope gradient;
  * blocked_rel_diff: |sinkhorn_emd - sinkhorn_emd_blocked| / value at
    the same schedule (the blocked variant had no at-scale parity check).

Uses the TRAINING defaults (iters=50, eps 0.5 -> 0.002). Run on CPU:
  python scripts/emd_scale_validation.py [--fast]
"""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from scipy.optimize import linear_sum_assignment  # noqa: E402
from scipy.spatial.distance import cdist  # noqa: E402

from dpdist_tpu.data.registration import RegistrationDataset  # noqa: E402
from dpdist_tpu.ops.emd import sinkhorn_emd, sinkhorn_emd_blocked  # noqa: E402

ITERS, EPS0, EPS1 = 50, 0.5, 0.002


def exact(src, tmpl):
    D = cdist(src, tmpl)
    r, c = linear_sum_assignment(D)
    diff = src[r] - tmpl[c]
    g = np.zeros_like(src)
    g[r] = diff / (np.linalg.norm(diff, axis=1, keepdims=True) + 1e-12) / len(src)
    return D[r, c].mean(), g


def main():
    fast = "--fast" in sys.argv
    rows = []
    for N, B in ((64, 16), (256, 8), (1024, 4)):
        if fast and N > 256:
            continue
        ds = RegistrationDataset(n_templates=8, num_point=N, seed=0,
                                 sparse=1, s_rand_points=1.0,
                                 centroid_sub=False)
        tmpl, src, _ = ds.sample_batch(B)
        tj, sj = jnp.asarray(tmpl), jnp.asarray(src)

        def emd_sum(s):
            return jnp.sum(sinkhorn_emd(s, tj, ITERS, EPS0, EPS1))

        vals = np.asarray(sinkhorn_emd(sj, tj, ITERS, EPS0, EPS1))
        g_sink = np.asarray(jax.grad(emd_sum)(sj))
        blocked = np.asarray(sinkhorn_emd_blocked(
            sj, tj, iters=ITERS, eps_start=EPS0, eps_end=EPS1,
            tile=min(N, 256)))

        cos, verr = [], []
        for b in range(B):
            v_ex, g_ex = exact(src[b], tmpl[b])
            verr.append(abs(vals[b] - v_ex) / v_ex)
            num = (g_sink[b] * g_ex).sum()
            den = np.linalg.norm(g_sink[b]) * np.linalg.norm(g_ex) + 1e-12
            cos.append(num / den)
        row = {
            "N": N, "B": B, "iters": ITERS,
            "value_rel_err_mean": round(float(np.mean(verr)), 5),
            "value_rel_err_max": round(float(np.max(verr)), 5),
            "grad_cosine_mean": round(float(np.mean(cos)), 4),
            "grad_cosine_min": round(float(np.min(cos)), 4),
            "blocked_rel_diff_max": round(float(
                np.max(np.abs(blocked - vals) / np.maximum(vals, 1e-9))), 6),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("results/emd_scale_validation.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
