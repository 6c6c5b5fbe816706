import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.eval.dense import dense_point_to_surface
from dpdist_tpu.models import init_dpdist, apply_dpdist
from dpdist_tpu.parallel import make_mesh

CFG = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(32, 32, 32))


def test_dense_matches_bidirectional_forward(rng):
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    cloud = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    queries = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    d = dense_point_to_surface(params, state, CFG, cloud, queries)
    pred_AB, _, _ = apply_dpdist(params, state, CFG, cloud, queries)
    np.testing.assert_allclose(np.asarray(d), np.asarray(pred_AB[..., 0]),
                               atol=1e-5)


def test_dense_points_axis_sharding_matches_single(rng):
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    cloud = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    queries = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1024, 3)).astype(np.float32))
    single = dense_point_to_surface(params, state, CFG, cloud, queries)
    mesh = make_mesh(data=1, points=8)
    sharded = dense_point_to_surface(params, state, CFG, cloud, queries,
                                     mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-5)


def test_conv_version_3_decoder(rng):
    cfg = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(32, 32, 32),
                       conv_version=3)
    params, state = init_dpdist(jax.random.PRNGKey(1), cfg)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    predAB, predBA, _ = apply_dpdist(params, state, cfg, pcA, pcB)
    assert predAB.shape == (2, 16, 3)
    assert float(jnp.min(predAB)) >= 0.0 and float(jnp.max(predAB)) <= 2.0

    # gradient flows
    def loss(p):
        a, b, _ = apply_dpdist(p, state, cfg, pcA, pcB)
        return jnp.mean(a[..., 0])

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # dense eval works with the conv3d decoder too
    d = dense_point_to_surface(params, state, cfg, pcA, pcB)
    np.testing.assert_allclose(np.asarray(d), np.asarray(predAB[..., 0]),
                               atol=1e-5)


def test_2d_dpdist_variant(rng):
    cfg = DPDistConfig(num_point=16, dims=2, embedding_size=64, k=3,
                       mlp=(32, 32, 32), output_channels=2)
    params, state = init_dpdist(jax.random.PRNGKey(2), cfg)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 2)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 2)).astype(np.float32))
    predAB, predBA, _ = apply_dpdist(params, state, cfg, pcA, pcB)
    assert predAB.shape == (2, 16, 2)
    assert float(jnp.min(predAB)) >= 0.0

    g = jax.grad(lambda p: float(0) + jnp.mean(
        apply_dpdist(p, state, cfg, pcA, pcB)[0][..., 0]))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_dense_pretransform_matches(rng):
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    cloud = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    queries = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 512, 3)).astype(np.float32))
    base = dense_point_to_surface(params, state, CFG, cloud, queries,
                                  pretransform="off")
    pre = dense_point_to_surface(params, state, CFG, cloud, queries,
                                 pretransform="on")
    np.testing.assert_allclose(np.asarray(pre), np.asarray(base), atol=2e-5)


def test_dense_pretransform_sharded(rng):
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    cloud = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 16, 3)).astype(np.float32))
    queries = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 1024, 3)).astype(np.float32))
    mesh = make_mesh(data=1, points=8)
    pre = dense_point_to_surface(params, state, CFG, cloud, queries,
                                 mesh=mesh, pretransform="on")
    base = dense_point_to_surface(params, state, CFG, cloud, queries,
                                  pretransform="off")
    np.testing.assert_allclose(np.asarray(pre), np.asarray(base), atol=2e-5)


def test_distance_field_shape(rng):
    from dpdist_tpu.eval.dense import distance_field
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    cloud = jnp.asarray(rng.uniform(-0.7, 0.7, (1, 16, 3)).astype(np.float32))
    f = distance_field(params, state, CFG, cloud, resolution=16)
    assert f.shape == (1, 16, 16, 16)
    assert np.isfinite(np.asarray(f)).all()
