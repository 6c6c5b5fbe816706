"""Qualify a frozen DPDist checkpoint: held-out eval L1 on a dataset.

The trainer records eval L1 only in runs/<dir>/metrics.jsonl, which is
gitignored and wiped on container replacement — after the Aug 18 wipe the
committed multifam net (results/dpdist_multi_r4_ckpt_best) had NO recorded
quality anywhere (round-4 VERDICT Weak #2 / advisor low #5). This script
measures it directly from the archive and, with --record, writes eval_l1
into the archive json so `DPDistTrainer.fit(archive_to=...)` initializes
its best-so-far bar from it (a resumed run can then never clobber the
archive with a worse checkpoint).

Parity anchor: eval_one_epoch_3d in the reference
(train_multi_gpu_pc_compare_dist.py:552-600) — L1 over the test split,
no augmentation.

Usage:
  python scripts/eval_dpdist_ckpt.py --ckpt results/dpdist_multi_r4_ckpt_best \
      --data_root data/synthetic_multi --category all [--record]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint base path")
    p.add_argument("--data_root", default="data/synthetic_multi")
    p.add_argument("--category", default="all")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--record", action="store_true",
                   help="write eval_l1 into the ckpt json metadata")
    a = p.parse_args(argv)

    import jax

    from dpdist_tpu.cli.train_aue import load_dpdist_checkpoint
    from dpdist_tpu.data.batching import assemble_dpdist_batch
    from dpdist_tpu.data.modelnet import SurfacePairDataset
    from dpdist_tpu.losses import l1_sample_loss
    from dpdist_tpu.models import apply_dpdist

    cfg, params, state = load_dpdist_checkpoint(a.ckpt)

    @jax.jit
    def eval_loss(p_, s_, pcA, pcB, labels):
        pred_AB, _, _ = apply_dpdist(p_, s_, cfg, pcA, pcB, train=False)
        return l1_sample_loss(pred_AB, labels)

    category = None if a.category == "all" else a.category
    ds = SurfacePairDataset(a.data_root, batch_size=a.batch_size,
                            npoints=cfg.num_point * 2, split="test",
                            class_choice=category, seed=a.seed)
    losses = []
    ds.reset()
    while ds.has_next_batch():
        bd, bl = ds.next_batch(augment=False)
        if bd.shape[0] == 0:
            continue
        pcA, pcB, labels = assemble_dpdist_batch(bd, bl)
        losses.append(float(eval_loss(params, state, pcA, pcB, labels)))
    l1 = float(np.mean(losses)) if losses else float("nan")

    with open(a.ckpt + ".json") as f:
        meta = json.load(f)
    out = {"ckpt": a.ckpt, "step": meta.get("step"), "eval_l1": l1,
           "n_batches": len(losses), "data_root": a.data_root,
           "category": a.category}
    print(json.dumps(out))

    if a.record and np.isfinite(l1):
        meta.setdefault("metadata", {})["eval_l1"] = l1
        with open(a.ckpt + ".json", "w") as f:
            json.dump(meta, f)


if __name__ == "__main__":
    main()
