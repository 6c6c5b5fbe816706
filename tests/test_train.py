import numpy as np
import jax
import pytest

from dpdist_tpu.configs import DPDistConfig, TrainConfig
from dpdist_tpu.data.gtgen import generate_synthetic_dataset
from dpdist_tpu.data.modelnet import SurfacePairDataset
from dpdist_tpu.nn.schedules import staircase_lr, bn_momentum_schedule
from dpdist_tpu.parallel import make_mesh
from dpdist_tpu.train import DPDistTrainer
from dpdist_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint

MCFG = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(64, 64, 64))


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("traindata"))
    generate_synthetic_dataset(
        root, families=("chair",), n_train=8, n_test=2,
        n_surface=600, num_neg_points=300, seed=0,
    )
    return root


def test_schedules():
    lr = staircase_lr(1e-4, decay_step=100, decay_rate=0.5, floor=1e-7)
    assert abs(float(lr(0)) - 1e-4) < 1e-10
    assert abs(float(lr(99)) - 1e-4) < 1e-10
    assert abs(float(lr(100)) - 5e-5) < 1e-10
    assert float(lr(10 ** 9)) == pytest.approx(1e-7)
    bn = bn_momentum_schedule()
    assert 0 < float(bn(0)) <= 0.99


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": [np.zeros(4), np.ones((2, 2))]}
    p = str(tmp_path / "ckpt_10")
    save_checkpoint(p, tree, step=10, metadata={"x": 1})
    restored, step, meta = restore_checkpoint(p, tree)
    assert step == 10 and meta == {"x": 1}
    np.testing.assert_array_equal(restored["a"], tree["a"])
    np.testing.assert_array_equal(restored["b"][1], tree["b"][1])
    assert latest_checkpoint(str(tmp_path)) == p


def test_checkpoint_structure_mismatch(tmp_path):
    p = str(tmp_path / "ckpt_1")
    save_checkpoint(p, {"a": np.zeros(2)})
    with pytest.raises(ValueError, match="structure mismatch"):
        restore_checkpoint(p, {"zzz": np.zeros(2)})


def test_single_device_training_reduces_loss(tiny_dataset, tmp_path):
    tcfg = TrainConfig(batch_size=4, learning_rate=1e-3, max_epoch=8,
                       augment=False, log_every=100)
    trainer = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "run"),
                            mesh=make_mesh(data=1))
    ds = SurfacePairDataset(tiny_dataset, batch_size=4, npoints=32,
                            num_neg_points=300, seed=0)
    bd, bl = ds.next_batch()
    losses = [float(trainer.train_step(bd, bl)["loss"]) for _ in range(50)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    # epoch loop + metrics plumbing
    epoch_loss = trainer.train_epoch(ds, 0)
    assert np.isfinite(epoch_loss)


def test_data_parallel_matches_single_device(tiny_dataset, tmp_path):
    """The 8-way sharded step must produce the same loss trajectory as the
    single-device step (same data, same init) — the reference's 'near
    linear scale' tower DP is exact synchronous DP, and so is ours."""
    tcfg = TrainConfig(batch_size=8, learning_rate=3e-4, augment=False,
                       log_every=100)
    ds1 = SurfacePairDataset(tiny_dataset, batch_size=8, npoints=32,
                             num_neg_points=300, seed=0)
    t1 = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "r1"),
                       mesh=make_mesh(data=1))
    t8 = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "r8"),
                       mesh=make_mesh(data=8))

    losses1, losses8 = [], []
    for step in range(3):
        ds1.reset()
        bd, bl = ds1.next_batch()
        m1 = t1.train_step(bd, bl)
        m8 = t8.train_step(bd, bl)
        losses1.append(float(m1["loss"]))
        losses8.append(float(m8["loss"]))
    np.testing.assert_allclose(losses1, losses8, rtol=2e-3, atol=1e-5)


def test_trainer_checkpoint_restore(tiny_dataset, tmp_path):
    tcfg = TrainConfig(batch_size=4, augment=False, log_every=100)
    trainer = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "run"))
    ds = SurfacePairDataset(tiny_dataset, batch_size=4, npoints=32,
                            num_neg_points=300, seed=0)
    bd, bl = ds.next_batch()
    trainer.train_step(bd, bl)
    path = trainer.save(tag=trainer.global_step)

    trainer2 = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "run"))
    trainer2.restore(path)
    p1 = jax.device_get(trainer.params)
    p2 = jax.device_get(trainer2.params)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_epoch(tiny_dataset, tmp_path):
    tcfg = TrainConfig(batch_size=2, augment=False, log_every=100)
    trainer = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "run"))
    ds = SurfacePairDataset(tiny_dataset, batch_size=2, npoints=32,
                            split="test", num_neg_points=300, seed=0)
    loss = trainer.eval_epoch(ds, 0)
    assert np.isfinite(loss)


def test_fit_keeps_best_checkpoint(tiny_dataset, tmp_path):
    import os
    tcfg = TrainConfig(batch_size=4, learning_rate=1e-3, augment=False,
                       log_every=100, checkpoint_every_epochs=100)
    trainer = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "fit"))
    ds = SurfacePairDataset(tiny_dataset, batch_size=4, npoints=32,
                            num_neg_points=300, seed=0)
    test_ds = SurfacePairDataset(tiny_dataset, batch_size=4, npoints=32,
                                 split="test", num_neg_points=300, seed=0)
    best = trainer.fit(ds, test_ds, max_epoch=2, eval_every=1)
    assert np.isfinite(best)
    assert os.path.exists(str(tmp_path / "fit" / "ckpt_best.npz"))


def test_fit_archives_best_and_respects_archive_bar(tiny_dataset, tmp_path):
    """Structural wipe-resilience (round-4 VERDICT #7): fit(archive_to=..)
    copies ckpt_best out of the (gitignored, twice-wiped) run dir on every
    improvement, records the selection metric, and a later fit() against
    the same archive initializes its best-bar from the recorded metric so
    a worse resumed run cannot clobber the archive."""
    import json
    import os

    from dpdist_tpu.train.checkpoint import archived_metric

    tcfg = TrainConfig(batch_size=4, learning_rate=1e-3, augment=False,
                       log_every=100, checkpoint_every_epochs=100)
    trainer = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "fit"))
    ds = SurfacePairDataset(tiny_dataset, batch_size=4, npoints=32,
                            num_neg_points=300, seed=0)
    test_ds = SurfacePairDataset(tiny_dataset, batch_size=4, npoints=32,
                                 split="test", num_neg_points=300, seed=0)
    arch = str(tmp_path / "archive" / "net")
    best = trainer.fit(ds, test_ds, max_epoch=2, eval_every=1,
                       archive_to=arch)
    assert os.path.exists(arch + ".npz")
    recorded = archived_metric(arch, "eval_l1")
    assert recorded == pytest.approx(best)

    # Pin the archive bar below anything attainable: a fresh fit must not
    # overwrite the archive (mtime unchanged).
    with open(arch + ".json") as f:
        meta = json.load(f)
    meta["metadata"]["eval_l1"] = 0.0
    with open(arch + ".json", "w") as f:
        json.dump(meta, f)
    mtime = os.path.getmtime(arch + ".npz")
    trainer2 = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "fit2"))
    trainer2.fit(ds, test_ds, max_epoch=1, eval_every=1, archive_to=arch)
    assert os.path.getmtime(arch + ".npz") == mtime
    assert archived_metric(arch, "eval_l1") == 0.0


def test_encoder_occlusion_training(tiny_dataset, tmp_path):
    """Occlusion-robust frozen-distance training (round 3): the encoder's
    conditioning cloud is occluded via the noise channel, labels stay vs
    the true surface; the batch pytree keeps a stable structure."""
    tcfg = TrainConfig(batch_size=4, learning_rate=1e-3, max_epoch=2,
                       augment=False, encoder_occlusion=0.25,
                       encoder_occlusion_prob=0.5)
    trainer = DPDistTrainer(MCFG, tcfg, run_dir=str(tmp_path / "runo"),
                            mesh=make_mesh(data=1))
    ds = SurfacePairDataset(tiny_dataset, batch_size=4, npoints=32,
                            num_neg_points=300, seed=0)
    bd, bl = ds.next_batch()
    batch = trainer._make_batch(bd, bl)
    assert "noise" in batch
    noise = np.asarray(batch["noise"])
    pcA = np.asarray(batch["pcA"])
    # occluded items: noise moves points onto OTHER surface points
    # (duplicate refill), so pcA + noise stays inside the cloud's hull
    assert np.isfinite(noise).all()
    corrupted = (np.abs(noise).max(axis=(1, 2)) > 0)
    # prob 0.5 over 4 items: at least sometimes nonzero across steps
    losses = [float(trainer.train_step(*ds.next_batch())["loss"])
              for _ in range(3) if ds.has_next_batch()]
    assert all(np.isfinite(l) for l in losses)
    # config roundtrip keeps the new knobs
    assert TrainConfig.from_json(tcfg.to_json()) == tcfg


def test_grad_clip_bounds_update_norm():
    """make_optimizer(grad_clip>0) global-norm clips BEFORE Adam (the
    round-4 BPTT-stability fix): a scaled-up gradient must produce the
    SAME update as the unscaled one once both exceed the clip norm."""
    import jax.numpy as jnp
    import optax
    from dpdist_tpu.train.optim import make_optimizer

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    g = {"w": jnp.full((4,), 3.0), "b": jnp.full((2,), -4.0)}
    big = jax.tree.map(lambda x: 100.0 * x, g)

    opt = make_optimizer(TrainConfig(grad_clip=1.0, learning_rate=1e-2))
    u1, _ = opt.update(g, opt.init(params), params)
    u2, _ = opt.update(big, opt.init(params), params)
    for k in u1:
        np.testing.assert_allclose(np.asarray(u1[k]), np.asarray(u2[k]),
                                   rtol=1e-6)
    gnorm = float(optax.global_norm(g))
    assert gnorm > 1.0  # premise: both inputs exceed the clip norm
