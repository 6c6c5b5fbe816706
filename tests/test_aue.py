import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpdist_tpu.configs import AUEConfig, DPDistConfig, TrainConfig
from dpdist_tpu.models import init_aue, apply_aue, init_dpdist
from dpdist_tpu.train.aue_trainer import AUETrainer, split_same_surface


def test_aue_pn_forward_shapes(rng):
    cfg = AUEConfig(num_point=32)
    params, state = init_aue(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 3)).astype(np.float32))
    rec, new_state = apply_aue(params, state, cfg, x, train=True)
    assert rec.shape == (2, 32, 3)
    assert float(jnp.max(jnp.abs(rec))) <= 1.0  # tanh output
    # BN state updated in train mode
    leaves_old = jax.tree_util.tree_leaves(state)
    leaves_new = jax.tree_util.tree_leaves(new_state)
    assert any(not np.allclose(a, b) for a, b in zip(leaves_old, leaves_new))


def test_aue_3dmfv_forward_shapes(rng):
    cfg = AUEConfig(num_point=16, encoder="3dmfv", n_gaussians=64)
    params, state = init_aue(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 3)).astype(np.float32))
    rec, _ = apply_aue(params, state, cfg, x, train=False)
    assert rec.shape == (2, 16, 3)


def test_split_same_surface(rng):
    # dataset batch layout: (B, 3*2N, 3)
    N = 8
    bd = rng.normal(size=(2, 6 * N, 3)).astype(np.float32)
    x1, x2 = split_same_surface(bd)
    np.testing.assert_array_equal(x1, bd[:, :N])
    np.testing.assert_array_equal(x2, bd[:, N:2 * N])


def _frozen_dpdist():
    dcfg = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(32, 32, 32))
    dparams, dstate = init_dpdist(jax.random.PRNGKey(7), dcfg)
    return dcfg, dparams, dstate


@pytest.mark.parametrize("opt_type", ["chamfer", "ours"])
def test_aue_training_reduces_loss(tmp_path, rng, opt_type):
    dcfg, dparams, dstate = _frozen_dpdist()
    acfg = AUEConfig(num_point=16)
    tcfg = TrainConfig(batch_size=4, learning_rate=1e-3, log_every=1000)
    tr = AUETrainer(acfg, tcfg, dcfg, dparams, dstate, opt_type=opt_type,
                    run_dir=str(tmp_path / f"aue_{opt_type}"))
    bd = rng.uniform(-0.7, 0.7, (4, 6 * 16, 3)).astype(np.float32)
    losses = [float(tr.train_step(bd)["loss"]) for _ in range(25)]
    assert all(np.isfinite(l) for l in losses)
    if opt_type == "chamfer":
        assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_aue_frozen_dpdist_params_not_updated(tmp_path, rng):
    dcfg, dparams, dstate = _frozen_dpdist()
    before = jax.device_get(dparams)
    acfg = AUEConfig(num_point=16)
    tcfg = TrainConfig(batch_size=2, learning_rate=1e-3, log_every=1000)
    tr = AUETrainer(acfg, tcfg, dcfg, dparams, dstate, opt_type="ours",
                    run_dir=str(tmp_path / "aue"))
    bd = rng.uniform(-0.7, 0.7, (2, 6 * 16, 3)).astype(np.float32)
    for _ in range(3):
        tr.train_step(bd)
    after = jax.device_get(dparams)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aue_reconstruct_and_checkpoint(tmp_path, rng):
    dcfg, dparams, dstate = _frozen_dpdist()
    acfg = AUEConfig(num_point=16)
    tcfg = TrainConfig(batch_size=2, log_every=1000)
    tr = AUETrainer(acfg, tcfg, dcfg, dparams, dstate,
                    run_dir=str(tmp_path / "aue"))
    rec = tr.reconstruct(rng.uniform(-1, 1, (2, 16, 3)).astype(np.float32))
    assert rec.shape == (2, 16, 3)
    path = tr.save("x")
    tr.restore(path)


def test_aue_eval_epoch(tmp_path, rng):
    dcfg, dparams, dstate = _frozen_dpdist()
    acfg = AUEConfig(num_point=16)
    tcfg = TrainConfig(batch_size=2, log_every=1000)
    tr = AUETrainer(acfg, tcfg, dcfg, dparams, dstate,
                    run_dir=str(tmp_path / "aue"))

    class FakeDS:
        def __init__(self):
            self.i = 0
            self.batch_size = 2
        def reset(self):
            self.i = 0
        def has_next_batch(self):
            return self.i < 2
        def next_batch(self, augment=False):
            self.i += 1
            return (np.random.default_rng(self.i).uniform(
                -0.7, 0.7, (2, 6 * 16, 3)).astype(np.float32),
                np.zeros((2, 4 * 16), np.float32))

    dp, ch = tr.eval_epoch(FakeDS(), 0)
    assert np.isfinite(dp) and np.isfinite(ch)
