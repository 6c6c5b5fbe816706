import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.distance import cdist
from scipy.optimize import linear_sum_assignment

from dpdist_tpu.ops.chamfer import nn_distance, chamfer_distance, pairwise_sqdist
from dpdist_tpu.ops.emd import sinkhorn_emd, earth_mover_distance
from dpdist_tpu.losses import l1_sample_loss, pred_mean_loss


def test_pairwise_sqdist_matches_cdist(rng):
    x = rng.normal(size=(2, 24, 3)).astype(np.float32)
    y = rng.normal(size=(2, 40, 3)).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    for b in range(2):
        want = cdist(x[b], y[b]) ** 2
        np.testing.assert_allclose(got[b], want, atol=1e-4)


def test_nn_distance_matches_bruteforce(rng):
    x = rng.normal(size=(2, 16, 3)).astype(np.float32)
    y = rng.normal(size=(2, 24, 3)).astype(np.float32)
    d1, i1, d2, i2 = nn_distance(jnp.asarray(x), jnp.asarray(y))
    for b in range(2):
        D = cdist(x[b], y[b]) ** 2
        np.testing.assert_allclose(np.asarray(d1)[b], D.min(1), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1)[b], D.argmin(1))
        np.testing.assert_allclose(np.asarray(d2)[b], D.min(0), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i2)[b], D.argmin(0))


def test_chamfer_identical_clouds_zero(rng):
    x = rng.normal(size=(1, 32, 3)).astype(np.float32)
    c = float(chamfer_distance(jnp.asarray(x), jnp.asarray(x)))
    # matmul-identity round-off puts a ~sqrt(1e-9) floor on the distance
    assert c < 1e-4


def test_emd_matches_hungarian(rng):
    # For equal-size clouds and uniform weights, exact EMD = optimal
    # assignment cost / N. Sinkhorn with annealed temperature should land
    # within a few percent.
    x = rng.normal(size=(1, 24, 3)).astype(np.float32)
    y = rng.normal(size=(1, 24, 3)).astype(np.float32)
    D = cdist(x[0], y[0])
    r, c = linear_sum_assignment(D)
    exact = D[r, c].sum() / 24.0
    approx = float(earth_mover_distance(jnp.asarray(x), jnp.asarray(y), iters=100))
    # Entropic plan with approximate marginals may land slightly below or
    # above the hard-assignment optimum; require agreement within 2%.
    assert abs(approx - exact) <= exact * 0.02 + 1e-3, (approx, exact)


def test_emd_identical_zero(rng):
    x = rng.normal(size=(1, 16, 3)).astype(np.float32)
    v = float(earth_mover_distance(jnp.asarray(x), jnp.asarray(x)))
    assert v < 0.05


def test_emd_gradient_direction(rng):
    # Moving y towards x along the gradient must decrease EMD.
    x = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))

    def f(yy):
        return jnp.mean(sinkhorn_emd(x, yy))

    g = jax.grad(f)(y)
    assert np.isfinite(np.asarray(g)).all()
    v0 = float(f(y))
    v1 = float(f(y - 0.01 * g / (jnp.linalg.norm(g) + 1e-9)))
    assert v1 <= v0 + 1e-6


def test_l1_sample_loss():
    pred = jnp.ones((2, 8, 3)) * 0.5
    labels = jnp.zeros((2, 8))
    assert abs(float(l1_sample_loss(pred, labels)) - 0.5) < 1e-6
    assert abs(float(pred_mean_loss(pred, pred)) - 0.5) < 1e-6


def test_knn_matches_bruteforce(rng):
    from dpdist_tpu.ops.knn import knn, pairwise_distance
    pts = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
    idx = np.asarray(knn(pts, 4))
    D = np.asarray(pairwise_distance(pts))
    for b in range(2):
        for n in range(32):
            want = set(np.argsort(D[b, n])[:4])
            assert set(idx[b, n]) == want
    idx2 = np.asarray(knn(pts, 3, exclude_self=True))
    assert not (idx2 == np.arange(32)[None, :, None]).any()


def test_blocked_emd_matches_dense(rng):
    from dpdist_tpu.ops.emd import sinkhorn_emd, sinkhorn_emd_blocked
    x = jnp.asarray(rng.normal(size=(2, 96, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 160, 3)).astype(np.float32))
    dense = np.asarray(sinkhorn_emd(x, y, 40, 0.5, 0.01))
    blocked = np.asarray(sinkhorn_emd_blocked(x, y, iters=40, tile=32))
    np.testing.assert_allclose(blocked, dense, rtol=0.03, atol=1e-3)


def test_blocked_emd_identical_near_zero(rng):
    from dpdist_tpu.ops.emd import sinkhorn_emd_blocked
    x = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    v = float(sinkhorn_emd_blocked(x, x, iters=40, tile=32)[0])
    assert v < 0.1, v

@pytest.mark.slow
def test_blocked_emd_matches_dense_at_scale(rng):
    """Large-N parity (VERDICT r3 next-#5): the blocked variant had no
    N>=1024 check against the dense plan at the training schedule."""
    from dpdist_tpu.ops.emd import sinkhorn_emd, sinkhorn_emd_blocked
    x = jnp.asarray(rng.normal(size=(1, 1024, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 1024, 3)).astype(np.float32))
    dense = np.asarray(sinkhorn_emd(x, y, 50, 0.5, 0.002))
    blocked = np.asarray(sinkhorn_emd_blocked(
        x, y, iters=50, eps_start=0.5, eps_end=0.002, tile=256))
    np.testing.assert_allclose(blocked, dense, rtol=0.01, atol=1e-4)


@pytest.mark.slow
def test_emd_grad_cosine_at_scale(rng):
    """Sinkhorn input-gradient vs the exact-assignment envelope gradient
    at N=256 (the CUDA matcher's operating range, tf_util_loss.py:42-47)."""
    from scipy.optimize import linear_sum_assignment
    from scipy.spatial.distance import cdist

    N = 256
    src = rng.normal(size=(N, 3)).astype(np.float32)
    tmpl = (src + rng.normal(scale=0.15, size=(N, 3))).astype(np.float32)

    def emd_sum(s):
        return jnp.sum(sinkhorn_emd(s, jnp.asarray(tmpl)[None], 50, 0.5, 0.002))

    g_sink = np.asarray(jax.grad(emd_sum)(jnp.asarray(src)[None]))[0]
    D = cdist(src, tmpl)
    r, c = linear_sum_assignment(D)
    diff = src[r] - tmpl[c]
    g_ex = np.zeros_like(src)
    g_ex[r] = diff / (np.linalg.norm(diff, axis=1, keepdims=True) + 1e-12) / N
    cos = (g_sink * g_ex).sum() / (
        np.linalg.norm(g_sink) * np.linalg.norm(g_ex) + 1e-12)
    assert cos > 0.9, cos
