"""Run-directory logging: flushed text log + JSONL metrics.

Parity with the reference's log_string/FileWriter observability
(train_multi_gpu_pc_compare_dist.py:930-934, 315-323): a run dir holds
the serialized config (replacing the hyperparameter-fingerprint dir name),
a flushed log_train.txt, and metrics.jsonl for machine-readable scalars
(replacing TF summaries).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Optional


class RunLogger:
    def __init__(self, run_dir: str, *, config_json: Optional[str] = None,
                 echo: bool = True, name: str = "train"):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.echo = echo
        self._log = open(os.path.join(run_dir, f"log_{name}.txt"), "a")
        self._metrics = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        if config_json is not None:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                f.write(config_json)
            self.log(f"config written to {run_dir}/config.json")
        # Provenance (replaces the reference's code self-backup into the
        # log dir, train_multi_gpu_pc_compare_dist.py:164-167).
        try:
            import subprocess

            rev = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)), timeout=5,
            ).stdout.strip()
            if rev:
                self.log(f"code revision: {rev}")
        except Exception:
            pass

    def log(self, msg: str):
        self._log.write(msg + "\n")
        self._log.flush()
        if self.echo:
            print(msg)
            sys.stdout.flush()

    def metrics(self, step: int, **scalars: Any):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._metrics.write(json.dumps(rec) + "\n")
        self._metrics.flush()

    def close(self):
        self._log.close()
        self._metrics.close()
