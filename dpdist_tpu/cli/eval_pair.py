"""Pairwise point-cloud distance evaluation.

Loads a trained DPDist checkpoint and scores cloud pairs with DPDist,
chamfer, and EMD — the comparison harness the reference runs implicitly
through its training-time summaries.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dpdist_ckpt", required=True)
    p.add_argument("--cloud_a", default=None, help="txt file (csv xyz rows)")
    p.add_argument("--cloud_b", default=None)
    p.add_argument("--num_point", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    import jax.numpy as jnp
    from dpdist_tpu.cli.train_aue import load_dpdist_checkpoint
    from dpdist_tpu.models import dpdist_distance
    from dpdist_tpu.ops.chamfer import chamfer_distance
    from dpdist_tpu.ops.emd import earth_mover_distance

    cfg, params, state = load_dpdist_checkpoint(a.dpdist_ckpt)

    if a.cloud_a and a.cloud_b:
        pcA = np.loadtxt(a.cloud_a, delimiter=",")[:, :3][None]
        pcB = np.loadtxt(a.cloud_b, delimiter=",")[:, :3][None]
        n = min(pcA.shape[1], pcB.shape[1], a.num_point)
        pcA, pcB = pcA[:, :n], pcB[:, :n]
    else:
        from dpdist_tpu.data.synthetic import synthetic_surface

        pcA = synthetic_surface("chair", seed=a.seed, n_points=a.num_point)[None] * 0.8
        pcB = synthetic_surface("chair", seed=a.seed + 1, n_points=a.num_point)[None] * 0.8

    pcA = jnp.asarray(pcA.astype(np.float32))
    pcB = jnp.asarray(pcB.astype(np.float32))
    print(json.dumps({
        "dpdist": float(dpdist_distance(params, state, cfg, pcA, pcB)),
        "chamfer": float(chamfer_distance(pcA, pcB)),
        "emd": float(earth_mover_distance(pcA, pcB)),
    }, indent=2))


if __name__ == "__main__":
    main()
