#!/usr/bin/env python3
"""Benchmark: DPDist point-cloud pairs/sec/chip (canonical config).

Runs the full bidirectional DPDist forward pass (the eval-metric / loss
path: 3DmFV encode both clouds -> local patches -> implicit decoder both
directions) on the default accelerator and reports throughput in
point-cloud pairs per second per chip.

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is an estimated TF1 single-GPU throughput for the same graph
(batch 16, ~30 ms/step sess.run incl. feed overhead ~= 533 pairs/s —
conservative for a 2020-era GPU on this tiny model; see BASELINE.md).
"""

import json
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 533.0  # estimated TF1 single-GPU (see BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist, apply_dpdist

    cfg = DPDistConfig()  # canonical: 512 gaussians, k=5, mlp 1024^3, np=64
    batch = 256           # throughput batch; pairs/sec is batch-normalized
    params, state = init_dpdist(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (batch, cfg.num_point, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-0.8, 0.8, (batch, cfg.num_point, 3)).astype(np.float32))

    @jax.jit
    def pair_eval(p, s, a, b):
        pred_AB, pred_BA, _ = apply_dpdist(p, s, cfg, a, b, train=False)
        return (jnp.mean(pred_AB[..., 0], axis=-1) + jnp.mean(pred_BA[..., 0], axis=-1)) / 2

    # warmup/compile (np.asarray forces a synchronous device fetch; on the
    # remote-relay platform block_until_ready alone can return early)
    np.asarray(pair_eval(params, state, pcA, pcB))

    # timed: pipelined dispatch, one synchronous fetch at the end
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pair_eval(params, state, pcA, pcB)
    np.asarray(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "dpdist_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
