"""Multi-host (DCN) initialization.

Single-slice multi-chip parallelism needs nothing beyond the mesh (XLA
compiles collectives onto ICI). Across hosts, JAX needs the coordinator
handshake; afterwards jax.devices() spans every host and the SAME mesh /
shard_map code runs unchanged — per-host data loading uses
jax.process_index() to shard input files.

The reference has no multi-host story at all (single-process TF1 towers,
SURVEY §2.5); this is the DCN extension point.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if the environment asks for it.

    Reads JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID when args
    are not given (also honors the standard cloud-TPU auto-detection by
    calling jax.distributed.initialize() with no args when only
    JAX_COORDINATOR is set). Returns True if distributed mode is active.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if coordinator is None:
        return False
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1"))
    if num_processes is None or process_id < 0:
        jax.distributed.initialize(coordinator_address=coordinator)
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return True


def process_shard(items, *, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Deterministically shard a list of items (e.g. dataset files) across
    hosts: host i takes items[i::P]."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]
