"""Export a trained DPDist checkpoint as a frozen serving artifact.

The jax.export analog of the reference's meta-graph handoff
(iterative_PCRNet_ours.py:229-231): the serialized StableHLO carries the
weights as constants and reloads in any compatible-JAX process without
this package. See dpdist_tpu/serving.py.

  python -m dpdist_tpu.cli.export_serving --dpdist_ckpt runs/d/ckpt_best \
      --out model.dpdist [--batch 256] [--with_grad] \
      [--platforms cpu tpu] [--num_point 64]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--dpdist_ckpt", default=None,
                     help="export the frozen distance from this ckpt")
    src.add_argument("--pcrnet_ckpt", default=None,
                     help="export a registration policy: (template, "
                          "source) -> (T_pred, aligned source)")
    p.add_argument("--out", required=True)
    p.add_argument("--num_point", type=int, default=None,
                   help="points per cloud (default: the checkpoint's)")
    p.add_argument("--batch", type=int, default=None,
                   help="pairs per call; omit for a symbolic batch dim")
    p.add_argument("--iterations", type=int, default=None,
                   help="pcrnet: refinement iterations (default: the "
                        "config's eval_iterations)")
    p.add_argument("--with_grad", action="store_true",
                   help="dpdist: export (distance, d/d src) — the "
                        "frozen-loss training signature")
    p.add_argument("--out_of_grid_penalty", type=float, default=1.0)
    p.add_argument("--platforms", nargs="+", default=None,
                   help="e.g. --platforms cpu tpu (default: current "
                        "backend only)")
    p.add_argument("--native_kernels", action="store_true",
                   help="keep the Pallas kernels (TPU-only artifact)")
    p.add_argument("--stop_threshold", type=float, default=None,
                   help="pcrnet: bake the convergence-stopping protocol "
                        "into the artifact (see eval_registration)")
    p.add_argument("--stop_period", type=int, default=1)
    p.add_argument("--stop_select", default="last",
                   choices=["last", "chamfer", "period0"])
    p.add_argument("--early_exit", action="store_true",
                   help="pcrnet + stop_threshold: serve a lax.while_loop "
                        "that returns as soon as the whole batch froze "
                        "(adaptive compute, same outputs)")
    a = p.parse_args(argv)

    from dpdist_tpu import serving

    if a.pcrnet_ckpt:
        import jax
        import json as _json

        from dpdist_tpu.configs import PCRNetConfig
        from dpdist_tpu.models import init_pcrnet
        from dpdist_tpu.train.checkpoint import restore_params_maybe_state

        with open(a.pcrnet_ckpt + ".json") as f:
            meta = _json.load(f)["metadata"]
        pcfg = PCRNetConfig.from_json(meta["pcrnet_config"])
        tp, ts = init_pcrnet(jax.random.PRNGKey(0), pcfg)
        params, state, _ = restore_params_maybe_state(a.pcrnet_ckpt, tp, ts)
        exported = serving.export_registration(
            params, pcfg, state=state, num_point=a.num_point,
            iterations=a.iterations, batch=a.batch,
            portable=not a.native_kernels, platforms=a.platforms,
            stop_threshold=a.stop_threshold, stop_period=a.stop_period,
            stop_select=a.stop_select, early_exit=a.early_exit)
    else:
        from dpdist_tpu.cli.train_aue import load_dpdist_checkpoint

        cfg, params, state = load_dpdist_checkpoint(a.dpdist_ckpt)
        exported = serving.export_frozen_distance(
            params, state, cfg,
            num_point=a.num_point, batch=a.batch, with_grad=a.with_grad,
            out_of_grid_penalty=a.out_of_grid_penalty,
            portable=not a.native_kernels, platforms=a.platforms)
    serving.save_exported(exported, a.out)
    print(json.dumps({
        "out": a.out,
        "bytes": os.path.getsize(a.out),
        "in_avals": [str(x) for x in exported.in_avals],
        "platforms": list(exported.platforms),
        "with_grad": a.with_grad,
    }))


if __name__ == "__main__":
    main()
