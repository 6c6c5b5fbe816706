import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.models import init_dpdist, apply_dpdist, dpdist_distance
from dpdist_tpu.losses import make_frozen_dpdist_loss

CFG = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(64, 64, 64))


def _clouds(rng, B=2, N=16):
    pcA = rng.uniform(-0.8, 0.8, (B, N, 3)).astype(np.float32)
    pcB = rng.uniform(-0.8, 0.8, (B, N, 3)).astype(np.float32)
    return jnp.asarray(pcA), jnp.asarray(pcB)


def test_forward_shapes_and_range(rng):
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    pcA, pcB = _clouds(rng)
    predAB, predBA, _ = apply_dpdist(params, state, CFG, pcA, pcB)
    assert predAB.shape == (2, 16, 3)
    assert predBA.shape == (2, 16, 3)
    # relu6(x)/3 output range
    assert float(jnp.min(predAB)) >= 0.0
    assert float(jnp.max(predAB)) <= 2.0


def test_outside_grid_points_masked(rng):
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    pcA, pcB = _clouds(rng)
    pcB_out = pcB.at[:, :4].set(5.0)  # push some queries outside the grid
    predAB, _, _ = apply_dpdist(params, state, CFG, pcA, pcB_out)
    np.testing.assert_allclose(np.asarray(predAB[:, :4]), 0.0, atol=1e-7)


def test_bf16_decoder_path_tracks_f32(rng):
    """cfg.dtype='bfloat16' runs the patch table + one-hot gather + decoder
    in bf16 (the serving/throughput config). Values must track the f32
    path within bf16 resolution and the mask zeroing must be exact."""
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    cfg16 = DPDistConfig(num_point=16, embedding_size=64, k=3,
                         mlp=(64, 64, 64), dtype="bfloat16")
    pcA, pcB = _clouds(rng)
    pcB = pcB.at[:, :4].set(5.0)  # off-grid queries stay exactly zero
    a32, b32, _ = apply_dpdist(params, state, CFG, pcA, pcB)
    a16, b16, _ = apply_dpdist(params, state, cfg16, pcA, pcB)
    assert a16.dtype == jnp.float32  # output restored to f32
    np.testing.assert_allclose(np.asarray(a16[:, :4]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a32), atol=0.03)
    np.testing.assert_allclose(np.asarray(b16), np.asarray(b32), atol=0.03)

    # frozen-loss gradients flow through the bf16 path and stay finite
    loss16 = make_frozen_dpdist_loss(params, state, cfg16)
    g = jax.grad(lambda s: loss16(s, pcA))(pcB * 0.1)
    assert np.isfinite(np.asarray(g)).all()


def test_jit_and_grad(rng):
    params, state = init_dpdist(jax.random.PRNGKey(1), CFG)
    pcA, pcB = _clouds(rng)
    labels = jnp.abs(jnp.asarray(np.random.default_rng(1).normal(size=(2, 16)))).astype(jnp.float32)

    @jax.jit
    def loss_fn(p, a, b, y):
        predAB, _, _ = apply_dpdist(p, state, CFG, a, b)
        return jnp.mean(jnp.abs(predAB[..., 0] - y))

    g = jax.grad(loss_fn)(params, pcA, pcB, labels)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_frozen_loss_grad_flows_to_inputs_not_params(rng):
    params, state = init_dpdist(jax.random.PRNGKey(2), CFG)
    pcA, pcB = _clouds(rng)
    loss = make_frozen_dpdist_loss(params, state, CFG)

    gA = jax.grad(lambda a: loss(a, pcB))(pcA)
    assert np.isfinite(np.asarray(gA)).all()
    assert float(jnp.max(jnp.abs(gA))) > 0

    # Differentiating through the closure w.r.t. params must give zeros.
    def wrt_params(p):
        return make_frozen_dpdist_loss(p, state, CFG)(pcA, pcB)

    gp = jax.grad(wrt_params)(params)
    assert all(float(jnp.max(jnp.abs(l))) == 0 for l in jax.tree_util.tree_leaves(gp))


def test_global_k0_variant(rng):
    cfg = DPDistConfig(num_point=16, embedding_size=64, k=0, mlp=(32, 32, 32))
    params, state = init_dpdist(jax.random.PRNGKey(3), cfg)
    pcA, pcB = _clouds(rng)
    predAB, predBA, _ = apply_dpdist(params, state, cfg, pcA, pcB)
    assert predAB.shape == (2, 16, 3)


def test_pointnet_encoder_variant(rng):
    cfg = DPDistConfig(num_point=16, embedding_size=64, k=0, mlp=(32, 32, 32),
                       encoder="pointnet", pointnet_embedding=64)
    params, state = init_dpdist(jax.random.PRNGKey(4), cfg)
    pcA, pcB = _clouds(rng)
    predAB, predBA, _ = apply_dpdist(params, state, cfg, pcA, pcB)
    assert predAB.shape == (2, 16, 3)


def test_noise_only_affects_encoder(rng):
    params, state = init_dpdist(jax.random.PRNGKey(5), CFG)
    pcA, pcB = _clouds(rng)
    # Huge noise: embeddings change, but queries (raw points) stay valid.
    noise = jnp.ones_like(pcA) * 0.05
    p1, _, _ = apply_dpdist(params, state, CFG, pcA, pcB)
    p2, _, _ = apply_dpdist(params, state, CFG, pcA, pcB, noise=noise)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_distance_self_symmetry(rng):
    params, state = init_dpdist(jax.random.PRNGKey(6), CFG)
    pcA, pcB = _clouds(rng)
    d = dpdist_distance(params, state, CFG, pcA, pcB, per_example=True)
    assert d.shape == (2,)


def test_bn_enabled_variant(rng):
    """BN=1 path: state updates in train mode, inference uses EMA stats."""
    cfg = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(32, 32, 32),
                       use_bn=True)
    params, state = init_dpdist(jax.random.PRNGKey(0), cfg)
    pcA, pcB = _clouds(rng)
    predAB, _, new_state = apply_dpdist(params, state, cfg, pcA, pcB,
                                        train=True, bn_momentum=0.9)
    assert predAB.shape == (2, 16, 3)
    old = jax.tree_util.tree_leaves(state)
    new = jax.tree_util.tree_leaves(new_state)
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
    # inference mode leaves state untouched and is deterministic
    p1, _, s1 = apply_dpdist(params, new_state, cfg, pcA, pcB, train=False)
    p2, _, _ = apply_dpdist(params, new_state, cfg, pcA, pcB, train=False)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_direction_swap_symmetry(rng):
    """apply(A,B).pred_AB == apply(B,A).pred_BA exactly: pins the
    per-direction decode restructure (round 3) to the direction naming
    (pred_AB = B's points scored against surface(A))."""
    params, state = init_dpdist(jax.random.PRNGKey(2), CFG)
    pcA, pcB = _clouds(rng)
    ab1, ba1, _ = apply_dpdist(params, state, CFG, pcA, pcB)
    ab2, ba2, _ = apply_dpdist(params, state, CFG, pcB, pcA)
    np.testing.assert_array_equal(np.asarray(ab1), np.asarray(ba2))
    np.testing.assert_array_equal(np.asarray(ba1), np.asarray(ab2))


def test_frozen_loss_mfv_mode_matches(rng):
    """The frozen-loss composition (the flagship PCRNet training loss)
    under fused_gather='mfv' matches the XLA path: value and source-cloud
    gradient — the exact computation train_pcrnet --loss_type dpdist
    differentiates through on TPU."""
    import jax
    import numpy as np
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist

    cfg0 = DPDistConfig(num_point=16, embedding_size=64, k=3,
                        mlp=(32, 32, 32), fused_gather="off")
    cfg1 = cfg0.replace(fused_gather="mfv")
    params, state = init_dpdist(jax.random.PRNGKey(0), cfg0)
    pcA = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 16, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-1.1, 1.1, (2, 16, 3)).astype(np.float32))

    vals, grads = [], []
    for cfg in (cfg0, cfg1):
        lf = make_frozen_dpdist_loss(params, state, cfg)
        v, g = jax.value_and_grad(lf)(pcA, pcB)
        vals.append(float(v))
        grads.append(np.asarray(g))
    assert abs(vals[0] - vals[1]) < 2e-6
    np.testing.assert_allclose(grads[1], grads[0], atol=2e-5)


def test_resolve_for_grad_dispatch(monkeypatch):
    """Grad contexts resolve 'auto' to 'table' on TPU (idle A/B,
    results/idle_r5/ab_grad_paths.jsonl: table wins every grad path) and
    leave everything else alone."""
    import importlib

    # the ops package re-exports the threedmfv FUNCTION under the same
    # name, shadowing attribute access to the submodule
    tmfv = importlib.import_module("dpdist_tpu.ops.threedmfv")
    from dpdist_tpu.models.dpdist import resolve_for_grad, _fused_gather_mode

    auto = DPDistConfig()
    assert auto.fused_gather == "auto"

    # Off-TPU: unchanged ('auto' already resolves to the XLA path).
    monkeypatch.setattr(tmfv, "_on_tpu", lambda: False)
    assert resolve_for_grad(auto) is auto
    assert _fused_gather_mode(auto) == "off"

    # On TPU: auto -> table for grads (forward auto stays 'mfv').
    monkeypatch.setattr(tmfv, "_on_tpu", lambda: True)
    g = resolve_for_grad(auto)
    assert g.fused_gather == "table"
    assert g.replace(fused_gather="auto") == auto  # nothing else touched
    assert _fused_gather_mode(auto) == "mfv"

    # Explicit settings are respected in grad contexts too.
    for explicit in ("off", "on", "table", "mfv", "full"):
        c = auto.replace(fused_gather=explicit)
        assert resolve_for_grad(c) is c
