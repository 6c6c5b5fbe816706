"""Golden regression tests: fixed-seed forward outputs.

Guards against unintended numeric drift in the DPDist forward path (the
SURVEY's bit-comparability concern #1). Golden values were produced by
this implementation at framework version 0.1.0 on the CPU backend with
HIGHEST matmul precision; a change here means the model function changed
behavior, which must be deliberate.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.models import init_dpdist, apply_dpdist
from dpdist_tpu.ops.threedmfv import threedmfv


def _fixed_clouds():
    rng = np.random.default_rng(1234)
    pcA = rng.uniform(-0.8, 0.8, (1, 8, 3)).astype(np.float32)
    pcB = rng.uniform(-0.8, 0.8, (1, 8, 3)).astype(np.float32)
    return jnp.asarray(pcA), jnp.asarray(pcB)


def test_golden_threedmfv_checksums():
    pcA, _ = _fixed_clouds()
    fv = np.asarray(threedmfv(pcA, 64, 0.25))
    # structural invariants that pin the exact normalization semantics
    np.testing.assert_allclose(np.linalg.norm(fv[0, :, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(fv[0, :, 5]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(fv.sum()), 7.911134, atol=2e-3)
    np.testing.assert_allclose(float(np.abs(fv).sum()), 122.28841, atol=2e-2)


def test_golden_dpdist_forward():
    cfg = DPDistConfig(num_point=8, embedding_size=64, k=3, mlp=(16, 16, 16),
                       output_act="centered")  # centered head: nonzero at init
    params, state = init_dpdist(jax.random.PRNGKey(42), cfg)
    pcA, pcB = _fixed_clouds()
    predAB, predBA, _ = apply_dpdist(params, state, cfg, pcA, pcB)
    got = float(predAB[..., 0].mean()) + 2.0 * float(predBA[..., 0].mean())
    np.testing.assert_allclose(got, _GOLDEN_FORWARD, atol=5e-5)


# Regenerate deliberately with:
#   python -c "import tests.test_golden as g; print(g._compute())"
def _compute():
    cfg = DPDistConfig(num_point=8, embedding_size=64, k=3, mlp=(16, 16, 16),
                       output_act="centered")
    params, state = init_dpdist(jax.random.PRNGKey(42), cfg)
    pcA, pcB = _fixed_clouds()
    predAB, predBA, _ = apply_dpdist(params, state, cfg, pcA, pcB)
    return float(predAB[..., 0].mean()) + 2.0 * float(predBA[..., 0].mean())


_GOLDEN_FORWARD = -0.023167923092842102
