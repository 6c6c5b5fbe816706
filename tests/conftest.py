"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world replacement for "test multi-node without a cluster":
XLA hosts 8 virtual CPU devices so every sharding/collective path compiles
and executes exactly as it would on an 8-chip ICI slice.

Note: the environment may pre-select a TPU platform via sitecustomize
(JAX_PLATFORMS=axon), so the env var alone is not enough — we also force
the platform through jax.config before any backend initialization.
"""

import os

# Must be set before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# CPU matmuls run in fp32 regardless; keep default-precision semantics
# identical across platforms for the numerics tests.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.devices()[0].platform
    )
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
