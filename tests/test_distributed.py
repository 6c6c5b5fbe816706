"""Multi-host (DCN) smoke: 2 real processes, one coordinator, collectives.

Converts parallel/distributed.py from "written" to "works" (VERDICT
missing #5): two local processes handshake via jax.distributed, see each
other's CPU devices, and run a global psum — the same mechanism a
multi-host TPU pod uses over DCN, minus the ICI fabric.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize pins TPU otherwise

from dpdist_tpu.parallel.distributed import initialize_distributed, process_shard

active = initialize_distributed()
assert active, "JAX_COORDINATOR was set; initialize_distributed must engage"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2 * jax.local_device_count()

# per-host input sharding: disjoint, covering
mine = process_shard(list(range(10)))
assert mine == list(range(10))[jax.process_index()::2]

# a cross-process collective: psum over every device on both hosts
import jax.numpy as jnp
out = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
    jnp.ones(jax.local_device_count()))
assert float(out[0]) == jax.device_count(), float(out[0])

print(f"proc {jax.process_index()} OK devices={jax.device_count()}")
"""


def test_two_process_dcn_smoke(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            # 2 virtual CPU devices per process -> 4 global
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        })
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK devices=4" in out, out
