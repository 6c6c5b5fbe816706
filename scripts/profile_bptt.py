#!/usr/bin/env python3
"""Stage profile of the flagship full-BPTT PCRNet train_single step.

VERDICT r4 #5: the repo's actual flagship recipe (--train_single
--grad_clip 1.0, frozen DPDist loss, 8-iteration unrolled refinement;
reference iterative_PCRNet.py:313-318 + iterative_PCRNet_ours.py:248-257)
had never been stage-profiled. Decomposition at the flagship shapes
(B=16, np=64, max_loops=8, pointnet PCRNet encoder):

  refine_fwd     8 refinement forwards (the lax.scan BPTT graph, value)
  loss_fwd       refine_fwd + the per-iteration frozen DPDist loss
                 (vmapped over the 8-step trajectory = dpdist fwd at
                 effective batch 8*B)
  loss_bwd_only  gradient of the frozen loss wrt the trajectory alone
                 (no BPTT through the encoder)
  refine_grad    BPTT through the refinement alone (sum of trajectory)
  full_step      value_and_grad of the real loss wrt params (the step)

Prints one JSON line per stage. Chip-contention sensitive: run idle for
absolute numbers; interleaved repeats make relative shares usable
contended. --loss chamfer profiles the chamfer-supervised variant.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def t_ms(fn, *args, iters=10, reps=3):
    f = jax.jit(fn)
    np.asarray(f(*args))
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(out)
        meds.append(1000 * (time.perf_counter() - t0) / iters)
    return float(np.median(meds))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loss", default="dpdist", choices=["dpdist", "chamfer"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--loops", type=int, default=8)
    ap.add_argument("--dpdist_ckpt", default="results/dpdist_multi_r4_ckpt_best")
    a = ap.parse_args()

    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.models import init_pcrnet
    from dpdist_tpu.models.pcrnet import pcrnet_refine
    from dpdist_tpu.losses import make_frozen_dpdist_loss
    from dpdist_tpu.ops.chamfer import chamfer_distance
    from dpdist_tpu.cli.train_aue import load_dpdist_checkpoint

    cfg = PCRNetConfig(num_point=64, max_loops=a.loops, out_features=1024)
    B, N = a.batch, cfg.num_point
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-0.7, 0.7, (B, N, 3)).astype(np.float32))
    tmpl = jnp.asarray(rng.uniform(-0.7, 0.7, (B, N, 3)).astype(np.float32))
    params, state = init_pcrnet(jax.random.PRNGKey(0), cfg)

    if a.loss == "dpdist":
        dcfg, dparams, dstate = load_dpdist_checkpoint(a.dpdist_ckpt)
        dp_loss = make_frozen_dpdist_loss(dparams, dstate, dcfg)

        def single_loss(s, t):
            return dp_loss(s, t)
    else:
        def single_loss(s, t):
            return chamfer_distance(t, s, sqrt=True)

    def refine_traj(p, s):
        _, _, _, traj, _ = pcrnet_refine(
            p, cfg, src, tmpl, iterations=cfg.max_loops,
            stop_gradient_iters=False, return_trajectory=True,
            state=s, train=True, return_state=True)
        return traj

    def loss_of_traj(traj):
        return jnp.mean(jax.vmap(lambda s: single_loss(s, tmpl))(traj))

    def loss_fn(p, s):
        return loss_of_traj(refine_traj(p, s))

    stages = {}
    stages["refine_fwd"] = t_ms(lambda p, s: jnp.sum(refine_traj(p, s)),
                                params, state)
    stages["loss_fwd"] = t_ms(loss_fn, params, state)
    traj0 = jax.jit(refine_traj)(params, state)
    stages["loss_bwd_only"] = t_ms(
        lambda t: jnp.sum(jax.grad(loss_of_traj)(t) ** 2), traj0)
    stages["refine_grad"] = t_ms(
        lambda p, s: sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(
            jax.grad(lambda pp: jnp.sum(refine_traj(pp, s)))(p))),
        params, state)
    stages["full_step"] = t_ms(
        lambda p, s: sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(
            jax.grad(loss_fn)(p, s))),
        params, state)

    derived = {
        "loss_fwd_share_ms": round(stages["loss_fwd"] - stages["refine_fwd"], 3),
        "bwd_total_ms": round(stages["full_step"] - stages["loss_fwd"], 3),
        "pairs_per_sec_full_step": round(B * 1000 / stages["full_step"], 1),
    }
    for k, v in stages.items():
        print(json.dumps({"stage": k, "ms": round(v, 3), "loss": a.loss,
                          "B": B, "loops": a.loops}), flush=True)
    print(json.dumps({"derived": derived, "loss": a.loss}), flush=True)


if __name__ == "__main__":
    main()
