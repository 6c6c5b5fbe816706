"""Round-4 queue, phase 2: replicate the FIXED multifam flagship recipe
(train_single + grad_clip 1.0 + chair-sliced best-ckpt, 1200 epochs) at
seeds 1 and 2.

Motivation: the phase-1 seed runs of the UNclipped 600-epoch recipe show
both r4 multifam dpdist seeds' final policies degraded (pooled acc@5 =
0.000 at the final epoch; r3's seed-0 1.46° was the lucky draw), so the
clipped recipe is the one whose replication matters. Same two-lane
stagger rules as r4_queue.py.

Usage: python scripts/r4_queue2.py [--dry]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from r4_queue import OUT, MF, pcr, run_queue  # noqa: E402


def jobs():
    J = []
    for s in (1, 2):
        J.append(pcr(f"mf_ts1200clip_s{s}_dpdist", "dpdist",
                     MF.replace("--max_epoch 600", "--max_epoch 1200"),
                     "--train_single", "--grad_clip", "1.0",
                     "--select_family", "chair", "--eval_cases", "160",
                     seed=s))
    return J


if __name__ == "__main__":
    run_queue(jobs(), dry="--dry" in sys.argv)
