import numpy as np
import jax.numpy as jnp
import pytest

from dpdist_tpu.ops.threedmfv import threedmfv
from dpdist_tpu.kernels.threedmfv_pallas import threedmfv_pallas


@pytest.mark.parametrize("B,N", [(2, 64), (2, 100), (1, 1000), (3, 8)])
def test_pallas_threedmfv_matches_jnp(rng, B, N):
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (B, N, 3)).astype(np.float32))
    want = np.asarray(threedmfv(pts, 512, 0.125))
    got = np.asarray(threedmfv_pallas(pts, 512, 0.125, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_threedmfv_with_outside_points(rng):
    pts = np.concatenate([
        rng.uniform(-0.5, 0.5, (1, 60, 3)),
        np.full((1, 4, 3), 5.0),
    ], axis=1).astype(np.float32)
    want = np.asarray(threedmfv(jnp.asarray(pts), 64, 0.125))
    got = np.asarray(threedmfv_pallas(jnp.asarray(pts), 64, 0.125, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_threedmfv_small_grid(rng):
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 32, 3)).astype(np.float32))
    want = np.asarray(threedmfv(pts, 64, 0.25))
    got = np.asarray(threedmfv_pallas(pts, 64, 0.25, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_chamfer_matches_xla(rng):
    from dpdist_tpu.kernels.chamfer_pallas import nn_min_sqdist_pallas, chamfer_distance_pallas
    from dpdist_tpu.ops.chamfer import nn_distance, chamfer_distance

    a = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 180, 3)).astype(np.float32))
    got = np.asarray(nn_min_sqdist_pallas(a, b, tile_n=32, tile_m=128,
                                          interpret=True))
    want = np.asarray(nn_distance(a, b)[0])
    np.testing.assert_allclose(got, want, atol=1e-4)

    c_got = float(chamfer_distance_pallas(a, b, interpret=True))
    c_want = float(chamfer_distance(a, b))
    assert abs(c_got - c_want) < 1e-4


def test_fused_gather_model_forward_matches(rng):
    import jax
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist, apply_dpdist

    base = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(32, 32, 32))
    fused = base.replace(fused_gather="on")
    params, state = init_dpdist(jax.random.PRNGKey(0), base)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 16, 3)).astype(np.float32))
    a0, b0, _ = apply_dpdist(params, state, base, pcA, pcB)
    a1, b1, _ = apply_dpdist(params, state, fused, pcA, pcB)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=2e-5)

    # gradients through the fused path (XLA-backed VJP)
    def loss(p, cfg):
        a, _, _ = apply_dpdist(p, state, cfg, pcA, pcB)
        return jnp.mean(a[..., 0])

    g0 = jax.grad(lambda p: loss(p, base))(params)
    g1 = jax.grad(lambda p: loss(p, fused))(params)
    for x, y in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-5)


def test_table_gather_kernel_exact(rng):
    """VMEM patch-table kernel == extract_patches + gather_patches: the
    forward is BIT-exact (each query reads exactly one voxel row). The
    round-3 Pallas backward folds multiple query-grads per voxel, so its
    summation order differs from the XLA oracle — parity is tight-
    tolerance, and additionally cross-checked against the retained XLA
    backward oracle (table_gather_bwd_xla_oracle)."""
    import jax
    from dpdist_tpu.ops.voxel import voxel_assign, extract_patches, gather_patches
    from dpdist_tpu.kernels.table_gather_pallas import (
        table_gather, table_gather_bwd_xla_oracle)

    for g, k, C in ((8, 5, 20), (4, 3, 7)):
        V = g ** 3
        fv = jnp.asarray(rng.normal(size=(2, V, C)).astype(np.float32))
        pts = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 12, 3)).astype(np.float32))
        vox, mask, _ = voxel_assign(pts, g)
        want = gather_patches(extract_patches(fv, g, k), vox, mask)
        got = table_gather(fv, vox, g, k, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        gout = jnp.asarray(rng.normal(size=want.shape).astype(np.float32))
        _, vjp_r = jax.vjp(
            lambda f: gather_patches(extract_patches(f, g, k), vox, mask), fv)
        _, vjp_n = jax.vjp(
            lambda f: table_gather(f, vox, g, k, interpret=True), fv)
        dr = np.asarray(vjp_r(gout)[0])
        dn = np.asarray(vjp_n(gout)[0])
        np.testing.assert_allclose(dn, dr, rtol=1e-5, atol=1e-5)
        do = np.asarray(table_gather_bwd_xla_oracle(
            vox, gout, grid_size=g, k=k, dtype=fv.dtype))
        np.testing.assert_allclose(dn, do, rtol=1e-5, atol=1e-5)
        # many-to-one voxel mapping is the order-sensitive case: all
        # queries in one voxel
        pts_same = jnp.zeros((2, 12, 3), jnp.float32) + 0.01
        vox_s, _, _ = voxel_assign(pts_same, g)
        _, vjp_s = jax.vjp(
            lambda f: table_gather(f, vox_s, g, k, interpret=True), fv)
        _, vjp_sr = jax.vjp(
            lambda f: gather_patches(extract_patches(f, g, k), vox_s, None), fv)
        np.testing.assert_allclose(np.asarray(vjp_s(gout)[0]),
                                   np.asarray(vjp_sr(gout)[0]),
                                   rtol=1e-5, atol=1e-5)


def test_table_gather_model_forward_matches(rng):
    import jax
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist, apply_dpdist

    base = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(32, 32, 32))
    fused = base.replace(fused_gather="table")
    params, state = init_dpdist(jax.random.PRNGKey(0), base)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 16, 3)).astype(np.float32))
    a0, _, _ = apply_dpdist(params, state, base, pcA, pcB)
    a1, _, _ = apply_dpdist(params, state, fused, pcA, pcB)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-5)

    def loss(p, cfg):
        a, _, _ = apply_dpdist(p, state, cfg, pcA, pcB)
        return jnp.mean(a[..., 0])

    g0 = jax.grad(lambda p: loss(p, base))(params)
    g1 = jax.grad(lambda p: loss(p, fused))(params)
    for x, y in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-5)


def test_fused_forward_full_matches_bf16_path(rng):
    """fused_gather='full' (whole decoder in VMEM) matches the composed
    bf16 path within bf16 rounding-order tolerance; masking preserved."""
    import jax
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist, apply_dpdist

    base = DPDistConfig(num_point=16, embedding_size=64, k=3,
                        mlp=(32, 32, 32), dtype="bfloat16")
    full = base.replace(fused_gather="full")
    params, state = init_dpdist(jax.random.PRNGKey(0), base)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    pcB = pcB.at[:, :3].set(5.0)  # off-grid -> exact zeros
    a0, b0, _ = apply_dpdist(params, state, base, pcA, pcB)
    a1, b1, _ = apply_dpdist(params, state, full, pcA, pcB)
    np.testing.assert_allclose(np.asarray(a1[:, :3]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-3)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=2e-3)
    # train=True must NOT take the non-differentiable fast path
    at, _, _ = apply_dpdist(params, state, full, pcA, pcB, train=True)
    assert np.isfinite(np.asarray(at)).all()


def test_table_gather_x_fused_matches_xla(rng):
    """Round-3 fused x-kernel (voxel assign + delta + [delta, patch]
    concat in VMEM) == the composed XLA path, fwd and both VJPs."""
    import jax
    from dpdist_tpu.ops.voxel import voxel_assign, extract_patches, gather_patches
    from dpdist_tpu.kernels.table_gather_pallas import table_gather_x

    g, k, C = 8, 5, 20
    V = g ** 3
    fv = jnp.asarray(rng.normal(size=(2, V, C)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 16, 3)).astype(np.float32))

    def xla_x(f, qq):
        vox, mask, delta = voxel_assign(qq, g)
        emb = gather_patches(extract_patches(f, g, k), vox, None)
        return jnp.concatenate([delta, emb], -1)

    want = np.asarray(xla_x(fv, q))
    got = np.asarray(table_gather_x(fv, q, g, k, interpret=True))
    np.testing.assert_array_equal(got, want)

    co = jnp.asarray(rng.normal(size=want.shape).astype(np.float32))
    gx = jax.grad(lambda f, qq: jnp.sum(xla_x(f, qq) * co), (0, 1))(fv, q)
    gp = jax.grad(lambda f, qq: jnp.sum(
        table_gather_x(f, qq, g, k, interpret=True) * co), (0, 1))(fv, q)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-5, atol=1e-5)


def test_table_gather_x_large_n_tiled(rng):
    """Query-axis tiling (N > 128 with a padded tail): fwd + both VJPs
    must match the XLA path across tile boundaries."""
    import jax
    from dpdist_tpu.ops.voxel import voxel_assign, extract_patches, gather_patches
    from dpdist_tpu.kernels.table_gather_pallas import table_gather_x, table_gather

    g, k, C, N = 8, 5, 20, 300  # 3 tiles of 128 with a padded tail
    V = g ** 3
    fv = jnp.asarray(rng.normal(size=(2, V, C)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-1.2, 1.2, (2, N, 3)).astype(np.float32))

    def xla_x(f, qq):
        vox, _, delta = voxel_assign(qq, g)
        emb = gather_patches(extract_patches(f, g, k), vox, None)
        return jnp.concatenate([delta, emb], -1)

    want = np.asarray(xla_x(fv, q))
    got = np.asarray(table_gather_x(fv, q, g, k, interpret=True))
    np.testing.assert_array_equal(got, want)

    co = jnp.asarray(rng.normal(size=want.shape).astype(np.float32))
    gx = jax.grad(lambda f, qq: jnp.sum(xla_x(f, qq) * co), (0, 1))(fv, q)
    gp = jax.grad(lambda f, qq: jnp.sum(
        table_gather_x(f, qq, g, k, interpret=True) * co), (0, 1))(fv, q)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-5, atol=1e-5)

    # plain table_gather at large N too
    vox, mask, _ = voxel_assign(q, g)
    want2 = gather_patches(extract_patches(fv, g, k), vox, None)
    got2 = table_gather(fv, vox, g, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))


def test_table_mode_large_n_dispatch(rng):
    """The model's 'table' mode dispatches to the two-step path for
    N > 128 (the x-kernel's single-tile VMEM limit); outputs and grads
    must match the XLA path on both sides of the boundary."""
    import jax
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist, apply_dpdist

    base = DPDistConfig(num_point=160, embedding_size=64, k=3,
                        mlp=(32, 32, 32))
    fused = base.replace(fused_gather="table")
    params, state = init_dpdist(jax.random.PRNGKey(0), base)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 160, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 160, 3)).astype(np.float32))
    a0, b0, _ = apply_dpdist(params, state, base, pcA, pcB)
    a1, b1, _ = apply_dpdist(params, state, fused, pcA, pcB)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=2e-5)

    def loss(cfg, A, B):
        a, b2, _ = apply_dpdist(params, state, cfg, A, B)
        return jnp.mean(a[..., 0]) + jnp.mean(b2[..., 0])

    gA0, gB0 = jax.grad(loss, (1, 2))(base, pcA, pcB)
    gA1, gB1 = jax.grad(loss, (1, 2))(fused, pcA, pcB)
    np.testing.assert_allclose(np.asarray(gA1), np.asarray(gA0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gB1), np.asarray(gB0),
                               rtol=1e-4, atol=1e-5)


def test_table_gather_bwd_transposed_parity(rng, monkeypatch):
    """Round-4 V-in-lanes backward (_table_gather_bwd_transposed) must
    match the 4-D fold kernel and the XLA oracle, including ragged query
    tiling and the many-queries-per-voxel fold case; and the env selector
    must route the custom VJP through it."""
    import jax
    import dpdist_tpu.kernels.table_gather_pallas as tg

    for g, k, C, N in ((8, 5, 20, 12), (8, 5, 20, 40), (4, 3, 7, 9)):
        V = g ** 3
        E = k ** 3 * C
        B = 2
        vox = jnp.asarray(rng.integers(0, V, (B, N)).astype(np.int32))
        grad = jnp.asarray(rng.normal(size=(B, N, E)).astype(np.float32))
        want = np.asarray(tg.table_gather_bwd_xla_oracle(
            vox, grad, grid_size=g, k=k, dtype=jnp.float32))
        got = np.asarray(tg._table_gather_bwd_transposed(
            vox, grad, grid_size=g, k=k, dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        ref = np.asarray(tg._table_gather_bwd_impl(
            vox, grad, grid_size=g, k=k, dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
        # the no-grid single-block variant must match the gridded one
        ng = np.asarray(tg._table_gather_bwd_transposed_ng(
            vox, grad, grid_size=g, k=k, dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(ng, want, rtol=1e-5, atol=1e-5)

    # N > 128 routes _table_gather_bwd_transposed_ng to the gridded kernel
    g, k, C, N = 4, 3, 7, 130
    V, E = g ** 3, k ** 3 * C
    vox = jnp.asarray(rng.integers(0, V, (1, N)).astype(np.int32))
    grad = jnp.asarray(rng.normal(size=(1, N, E)).astype(np.float32))
    big = np.asarray(tg._table_gather_bwd_transposed_ng(
        vox, grad, grid_size=g, k=k, dtype=jnp.float32, interpret=True))
    want = np.asarray(tg.table_gather_bwd_xla_oracle(
        vox, grad, grid_size=g, k=k, dtype=jnp.float32))
    np.testing.assert_allclose(big, want, rtol=1e-5, atol=1e-5)

    # all queries in one voxel (order-sensitive fold)
    vox1 = jnp.zeros((1, 16), jnp.int32) + 37
    grad1 = jnp.asarray(rng.normal(size=(1, 16, 5 ** 3 * 20)).astype(np.float32))
    a = np.asarray(tg._table_gather_bwd_transposed(
        vox1, grad1, grid_size=8, k=5, dtype=jnp.float32, interpret=True))
    b = np.asarray(tg.table_gather_bwd_xla_oracle(
        vox1, grad1, grid_size=8, k=5, dtype=jnp.float32))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    # selector routes the VJP
    monkeypatch.setattr(tg, "_BWD_IMPL", "transposed")
    fv = jnp.asarray(rng.normal(size=(1, 512, 20)).astype(np.float32))
    gout = jnp.asarray(rng.normal(size=(1, 12, 2500)).astype(np.float32))
    vox2 = jnp.asarray(rng.integers(0, 512, (1, 12)).astype(np.int32))
    _, vjp = jax.vjp(lambda f: tg.table_gather(f, vox2, 8, 5,
                                               interpret=True), fv)
    via_sel = np.asarray(vjp(gout)[0])
    monkeypatch.setattr(tg, "_BWD_IMPL", "fold")
    _, vjp2 = jax.vjp(lambda f: tg.table_gather(f, vox2, 8, 5,
                                                interpret=True), fv)
    np.testing.assert_allclose(via_sel, np.asarray(vjp2(gout)[0]),
                               rtol=1e-6, atol=1e-6)


def test_mfv_table_gather_x_matches_composition(rng):
    """Round-5 fully-fused front half (points -> decoder input) matches
    threedmfv(xla) -> astype -> table_gather_x, f32 and bf16, including
    outside-grid queries and a non-multiple-of-8 encode cloud."""
    import jax
    from dpdist_tpu.kernels.mfv_gather_pallas import mfv_table_gather_x
    from dpdist_tpu.kernels.table_gather_pallas import table_gather_x

    B, M, N, G, g, k, sigma = 2, 12, 16, 64, 4, 3, 0.25
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (B, M, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-1.2, 1.2, (B, N, 3)).astype(np.float32))
    for dt, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        fv = threedmfv(pts, G, sigma, impl="xla").astype(dt)
        want = np.asarray(table_gather_x(fv, q, g, k, interpret=True),
                          np.float32)
        got = np.asarray(
            mfv_table_gather_x(pts, q, G, sigma, g, k, dtype=dt,
                               interpret=True), np.float32)
        np.testing.assert_allclose(got, want, atol=tol)

    # Gradients: the custom VJP recomputes the XLA encode, so grads match
    # the unfused composition exactly (same backward graph).
    cot = jnp.asarray(rng.normal(size=(B, N, 3 + k ** 3 * 20))
                      .astype(np.float32))

    def f_ref(p, qq):
        fv = threedmfv(p, G, sigma, impl="xla")
        return jnp.sum(table_gather_x(fv, qq, g, k, interpret=True) * cot)

    def f_new(p, qq):
        return jnp.sum(
            mfv_table_gather_x(p, qq, G, sigma, g, k, interpret=True) * cot)

    gp0, gq0 = jax.grad(f_ref, argnums=(0, 1))(pts, q)
    gp1, gq1 = jax.grad(f_new, argnums=(0, 1))(pts, q)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq0), atol=1e-5)


def test_mfv_mode_model_forward_matches(rng):
    """apply_dpdist(fused_gather='mfv') == the XLA path, values and
    parameter/cloud gradients."""
    import jax
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist, apply_dpdist

    base = DPDistConfig(num_point=16, embedding_size=64, k=3,
                        mlp=(32, 32, 32), fused_gather="off")
    fused = base.replace(fused_gather="mfv")
    params, state = init_dpdist(jax.random.PRNGKey(0), base)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 16, 3)).astype(np.float32))
    a0, b0, _ = apply_dpdist(params, state, base, pcA, pcB)
    a1, b1, _ = apply_dpdist(params, state, fused, pcA, pcB)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=2e-5)

    def loss(p, A, Bc, cfg):
        a, b, _ = apply_dpdist(p, state, cfg, A, Bc)
        return jnp.mean(a[..., 0]) + jnp.mean(b[..., 0])

    g0 = jax.grad(loss, argnums=(0, 1, 2))(params, pcA, pcB, base)
    g1 = jax.grad(loss, argnums=(0, 1, 2))(params, pcA, pcB, fused)
    for x, y in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-5)
