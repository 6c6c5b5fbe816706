"""Checkpointing: pytrees <-> npz + json treedef.

The TPU-native replacement for tf.train.Saver (SURVEY §5): checkpoints are
plain param/state pytrees, and the reference's meta-graph-based module
composition (import_meta_graph + input_map,
train_multi_gpu_pc_compare_dist.py:427-439) becomes simply restoring a
pytree and closing a pure function over it (losses/dpdist_loss.py).

Format: <path>.npz holds the flattened leaves as arrays leaf_00000...;
<path>.json holds the key paths + metadata, so checkpoints are stable
across refactors that preserve dict structure and are readable without
this library.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import numpy as np
import jax


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
             for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves


def save_checkpoint(path: str, tree: Any, *, step: Optional[int] = None,
                    metadata: Optional[dict] = None) -> str:
    """Save a pytree. `path` is the base path (no extension)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    paths, leaves = _flatten_with_paths(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    # Atomic publish (write-temp + rename): a crash, container wipe, or
    # concurrent reader (archival copy, git add, a resumed trainer) must
    # never observe a torn checkpoint. The temp name ends in .npz so
    # np.savez does not append a second extension.
    np.savez(path + ".tmp.npz", **arrays)
    os.replace(path + ".tmp.npz", path + ".npz")
    meta = {"paths": paths, "step": step, "metadata": metadata or {}}
    with open(path + ".json.tmp", "w") as f:
        json.dump(meta, f)
    os.replace(path + ".json.tmp", path + ".json")
    return path


def restore_checkpoint(path: str, template: Any):
    """Restore into the structure of `template` (a matching pytree)."""
    with np.load(path + ".npz") as data:
        leaves = [data[f"leaf_{i:05d}"] for i in range(len(data.files))]
    with open(path + ".json") as f:
        meta = json.load(f)
    t_paths, t_leaves = _flatten_with_paths(template)
    if t_paths != meta["paths"]:
        raise ValueError(
            "checkpoint structure mismatch:\n saved: %s...\n template: %s..."
            % (meta["paths"][:5], t_paths[:5])
        )
    treedef = jax.tree_util.tree_structure(template)
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return restored, meta.get("step"), meta.get("metadata", {})


def restore_params_maybe_state(path: str, params_template: Any,
                               state_template: Any):
    """Restore a {'params', 'state'} checkpoint, falling back to the
    params-only round-1 format.

    Returns (params, state_or_None, step). The one place the fallback
    logic lives — eval/trainer/CLI callers must not re-implement it.
    """
    try:
        tree, step, _ = restore_checkpoint(
            path, {"params": params_template, "state": state_template})
        return tree["params"], tree["state"], step
    except (KeyError, ValueError):
        tree, step, _ = restore_checkpoint(path, {"params": params_template})
        return tree["params"], None, step


def archive_checkpoint(src_base: str, dst_base: str, *,
                       metric: Optional[float] = None,
                       metric_name: str = "metric",
                       extra: Optional[dict] = None) -> str:
    """Copy <src_base>.{npz,json} to <dst_base>.{npz,json}, recording
    `metric` (and `extra` keys) in the destination json metadata.

    The structural wipe-resilience mechanism: run dirs (`runs/`) are
    gitignored and were twice destroyed by container replacement; trainers
    call this on every best-checkpoint improvement so the survivable copy
    (`results/`) exists the moment the ckpt does, with the selection
    metric recorded so a resumed run can never clobber the archive with a
    worse checkpoint (see `archived_metric`).
    """
    import shutil

    d = os.path.dirname(os.path.abspath(dst_base))
    if d:
        os.makedirs(d, exist_ok=True)
    # Atomic publish, npz first then json (readers key on the json): a
    # torn archive after a crash/wipe/concurrent copy would defeat the
    # mechanism's whole purpose.
    shutil.copyfile(src_base + ".npz", dst_base + ".tmp.npz")
    os.replace(dst_base + ".tmp.npz", dst_base + ".npz")
    with open(src_base + ".json") as f:
        meta = json.load(f)
    md = meta.setdefault("metadata", {})
    if metric is not None:
        md[metric_name] = float(metric)
    if extra:
        md.update(extra)
    with open(dst_base + ".json.tmp", "w") as f:
        json.dump(meta, f)
    os.replace(dst_base + ".json.tmp", dst_base + ".json")
    return dst_base


def archived_meta(dst_base: str, key: str):
    """Read back a raw metadata value from an archive json, or None."""
    try:
        with open(dst_base + ".json") as f:
            meta = json.load(f)
        return meta.get("metadata", {}).get(key)
    except (OSError, ValueError):
        return None


def archived_metric(dst_base: str, metric_name: str = "metric"):
    """Read back the metric recorded by `archive_checkpoint`, or None if
    the archive (or the metric) does not exist."""
    v = archived_meta(dst_base, metric_name)
    try:
        return float(v) if v is not None else None
    except (ValueError, TypeError):
        return None


def latest_checkpoint(run_dir: str, prefix: str = "ckpt") -> Optional[str]:
    """Find the newest '<prefix>_<step>' base path in run_dir."""
    if not os.path.isdir(run_dir):
        return None
    best, best_step = None, -1
    pat = re.compile(rf"^{re.escape(prefix)}_(\d+)\.json$")
    for fn in os.listdir(run_dir):
        m = pat.match(fn)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(run_dir, fn[:-5])
    return best
