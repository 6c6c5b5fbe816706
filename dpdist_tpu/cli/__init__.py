"""CLI entry points.

Allow overriding the platform (e.g. DPDIST_PLATFORM=cpu for smoke runs)
for EVERY `python -m dpdist_tpu.cli.X` invocation: the -m runner imports
this package before the module, so this runs before first backend use.
Some environments pin JAX_PLATFORMS via sitecustomize, so the standard
env var cannot be relied on.
"""

import os

import jax

_plat = os.environ.get("DPDIST_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)
