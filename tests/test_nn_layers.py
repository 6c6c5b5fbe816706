"""NN layer-library parity tests (reference: utils/tf_util.py).

The conv/pool primitives the reference ships but its live models don't
use (conv2d, conv2d_transpose, max/avg pool 2d/3d) are part of the layer
library surface; verified against numpy oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.nn import (
    avg_pool2d,
    avg_pool3d,
    conv2d_apply,
    conv2d_init,
    conv2d_transpose_apply,
    max_pool2d,
    max_pool3d,
)


def test_conv2d_1x1_is_dense(rng):
    params = conv2d_init(jax.random.PRNGKey(0), 4, 8, (1, 1))
    x = jnp.asarray(rng.normal(size=(2, 5, 5, 4)).astype(np.float32))
    y = conv2d_apply(params, x)
    want = np.asarray(x) @ np.asarray(params["w"][0, 0]) + np.asarray(params["b"])
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


def test_conv2d_transpose_upsamples(rng):
    params = conv2d_init(jax.random.PRNGKey(1), 4, 8, (3, 3))
    x = jnp.asarray(rng.normal(size=(2, 5, 5, 4)).astype(np.float32))
    y = conv2d_transpose_apply(params, x, stride=(2, 2))
    # SAME transpose conv: spatial dims double (tf_util.get_deconv_dim)
    assert y.shape == (2, 10, 10, 8)
    # it inverts the strided conv's shape contract
    y2 = conv2d_apply({"w": params["w"],
                       "b": jnp.zeros(8)}, x, stride=(2, 2))
    assert y2.shape == (2, 3, 3, 8)


def test_pool2d_matches_numpy(rng):
    x = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)
    got_max = np.asarray(max_pool2d(jnp.asarray(x)))
    got_avg = np.asarray(avg_pool2d(jnp.asarray(x)))
    want_max = x.reshape(2, 3, 2, 3, 2, 3).max((2, 4))
    want_avg = x.reshape(2, 3, 2, 3, 2, 3).mean((2, 4))
    np.testing.assert_allclose(got_max, want_max, atol=1e-6)
    np.testing.assert_allclose(got_avg, want_avg, atol=1e-6)


def test_pool3d_matches_numpy(rng):
    x = rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32)
    got_max = np.asarray(max_pool3d(jnp.asarray(x)))
    got_avg = np.asarray(avg_pool3d(jnp.asarray(x)))
    want_max = x.reshape(2, 2, 2, 2, 2, 2, 2, 3).max((2, 4, 6))
    want_avg = x.reshape(2, 2, 2, 2, 2, 2, 2, 3).mean((2, 4, 6))
    np.testing.assert_allclose(got_max, want_max, atol=1e-6)
    np.testing.assert_allclose(got_avg, want_avg, atol=1e-6)


def test_avg_pool_same_padding_edge_counts(rng):
    """SAME avg pooling divides by the actual window population at edges."""
    x = np.ones((1, 3, 3, 1), np.float32)
    got = np.asarray(avg_pool2d(jnp.asarray(x), (2, 2), stride=(1, 1),
                                padding="SAME"))
    np.testing.assert_allclose(got, 1.0, atol=1e-6)
