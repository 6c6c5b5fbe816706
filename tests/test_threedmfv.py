import numpy as np
import jax.numpy as jnp

from dpdist_tpu.ops.threedmfv import threedmfv, threedmfv_grid
from oracles import threedmfv_oracle


def test_grid_matches_reference_order():
    mu = threedmfv_grid(512, 3)
    g = 8
    l = np.linspace(-1, 1, g, False) + 1 / g
    # flat v = iy*g^2 + ix*g + iz -> center (l[ix], l[iy], l[iz])
    v = 3 * g * g + 5 * g + 7
    np.testing.assert_allclose(mu[v], [l[5], l[3], l[7]], rtol=1e-6)


def test_threedmfv_matches_oracle_full(rng):
    pts = rng.uniform(-0.95, 0.95, (2, 32, 3)).astype(np.float32)
    got = np.asarray(threedmfv(jnp.asarray(pts), 512, 0.125))
    want = threedmfv_oracle(pts.astype(np.float64), 512, 0.125)
    assert got.shape == (2, 512, 20)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-3)


def test_threedmfv_matches_oracle_flat(rng):
    pts = rng.uniform(-0.9, 0.9, (3, 16, 3)).astype(np.float32)
    got = np.asarray(threedmfv(jnp.asarray(pts), 64, 0.25, flatten=True))
    want = threedmfv_oracle(pts.astype(np.float64), 64, 0.25, flatten=True)
    assert got.shape == (3, 20 * 64)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-3)


def test_threedmfv_small_fv(rng):
    pts = rng.uniform(-0.9, 0.9, (2, 24, 3)).astype(np.float32)
    got = np.asarray(threedmfv(jnp.asarray(pts), 64, 0.25, full_fv=False))
    want = threedmfv_oracle(pts.astype(np.float64), 64, 0.25, full_fv=False)
    assert got.shape == (2, 64, 7)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-3)


def test_threedmfv_handles_far_points(rng):
    # Reference divides raw probabilities (0/0 -> NaN for far points);
    # the softmax formulation must stay finite.
    pts = np.concatenate(
        [rng.uniform(-0.5, 0.5, (1, 30, 3)), np.full((1, 2, 3), 50.0)], axis=1
    ).astype(np.float32)
    out = np.asarray(threedmfv(jnp.asarray(pts), 64, 0.125))
    assert np.isfinite(out).all()
