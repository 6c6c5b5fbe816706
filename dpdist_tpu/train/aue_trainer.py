"""Autoencoder task trainer with a frozen DPDist loss.

Reference phases 2+3 (train_multi_gpu_pc_compare_dist.py:358-515):
phase 2 builds the AUE and saves it; phase 3 splices the frozen DPDist
graph on top and trains ONLY the AUE with either the DPDist prediction
loss or chamfer. Here the splice is plain function composition:

    loss = dpdist_frozen(aue(params, x1), x2)        # opt_type='ours'
    loss = chamfer(x1, aue(params, x1), sqrt=False)  # opt_type='chamfer'

with x1, x2 two same-surface samples (the surface block halved,
train_one_epoch_3d_block_modelnet:543-547). Gradients flow through the
frozen DPDist network (inference mode) into the AUE only.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import AUEConfig, DPDistConfig, TrainConfig
from dpdist_tpu.losses import make_frozen_dpdist_loss
from dpdist_tpu.models import init_aue, apply_aue
from dpdist_tpu.ops.chamfer import chamfer_distance
from dpdist_tpu.parallel import make_mesh, replicate, shard_batch, build_sharded_train_step
from dpdist_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
from dpdist_tpu.train.logging import RunLogger
from dpdist_tpu.train.optim import make_optimizer


def split_same_surface(batch_data: np.ndarray):
    """(B, 3*2N, 3) dataset batch -> x1, x2: two N-point same-surface samples."""
    B, total, _ = batch_data.shape
    n2 = total // 3
    N = n2 // 2
    surface = batch_data[:, :n2]
    return (surface[:, :N].astype(np.float32),
            surface[:, N:2 * N].astype(np.float32))


class AUETrainer:
    def __init__(self, aue_cfg: AUEConfig, train_cfg: TrainConfig,
                 dpdist_cfg: DPDistConfig, dpdist_params, dpdist_state,
                 *, opt_type: str = "ours", run_dir: str = "runs/aue",
                 mesh=None, logger: Optional[RunLogger] = None):
        assert opt_type in ("ours", "chamfer")
        self.acfg = aue_cfg
        self.tcfg = train_cfg
        self.opt_type = opt_type
        self.run_dir = run_dir
        self.mesh = mesh if mesh is not None else make_mesh(data=1)
        self.logger = logger or RunLogger(run_dir, config_json=aue_cfg.to_json(),
                                          name=f"train_aue_{opt_type}")

        key = jax.random.PRNGKey(train_cfg.seed)
        params, state = init_aue(key, aue_cfg)
        self.params = replicate(params, self.mesh)
        self.state = replicate(state, self.mesh)
        self.optimizer = make_optimizer(train_cfg, base_lr=train_cfg.learning_rate)

        dpdist_loss = make_frozen_dpdist_loss(dpdist_params, dpdist_state, dpdist_cfg)
        acfg = aue_cfg

        def loss_fn(p, s, batch):
            x1, x2 = batch["x1"], batch["x2"]
            rec, new_state = apply_aue(p, s, acfg, x1, train=True)
            if opt_type == "ours":
                loss = dpdist_loss(rec, x2)
            else:
                # squared chamfer, matching chmafer_dist (:912-916)
                loss = chamfer_distance(x1, rec, sqrt=False)
            return loss, new_state

        init_opt, self._step = build_sharded_train_step(loss_fn, self.optimizer,
                                                        self.mesh)
        self.opt_state = init_opt(params)
        self.global_step = 0

        # Monitoring: both losses regardless of which one trains
        # (reference logs DPDist + Chamfer scalars, :466-469).
        def monitor(p, s, x1, x2):
            rec, _ = apply_aue(p, s, acfg, x1, train=False)
            return dpdist_loss(rec, x2), chamfer_distance(x1, rec, sqrt=False)

        self._monitor = jax.jit(monitor)

    def reconstruct(self, points):
        rec, _ = jax.jit(
            lambda p, s, x: apply_aue(p, s, self.acfg, x, train=False)
        )(self.params, self.state, jnp.asarray(points))
        return np.asarray(rec)

    def train_step(self, batch_data: np.ndarray):
        x1, x2 = split_same_surface(batch_data)
        batch = shard_batch({"x1": x1, "x2": x2}, self.mesh)
        self.params, self.state, self.opt_state, metrics = self._step(
            self.params, self.state, self.opt_state, batch
        )
        self.global_step += 1
        return metrics

    def train_epoch(self, dataset, epoch: int, *, snapshot_every: int = 0):
        losses, closses = [], []
        dataset.reset()
        while dataset.has_next_batch():
            bd, _ = dataset.next_batch(augment=False)
            if bd.shape[0] < self.tcfg.batch_size:
                continue
            m = self.train_step(bd)
            losses.append(float(m["loss"]))
        # monitored pair losses on the last batch
        if losses:
            x1, x2 = split_same_surface(bd)
            dp, ch = self._monitor(self.params, self.state,
                                   jnp.asarray(x1), jnp.asarray(x2))
            closses = [float(ch)]
            self.logger.log(
                f" ---- epoch: {epoch + 1:03d} ---- DPDist mean loss: "
                f"{float(dp):f} chamf mean loss: {float(ch):f}"
            )
            self.logger.metrics(self.global_step, epoch=epoch,
                                train_loss=float(np.mean(losses)),
                                dpdist_loss=float(dp), chamfer_loss=float(ch))
            if snapshot_every and epoch % snapshot_every == 0:
                # reconstruction snapshot (reference :574-590)
                from dpdist_tpu.eval.viz import save_cloud_pair

                rec = self.reconstruct(x1[:1])
                save_cloud_pair(
                    os.path.join(self.run_dir, f"rec_epoch{epoch}.png"),
                    rec[0], x1[0],
                )
        return float(np.mean(losses)) if losses else float("nan")

    def eval_epoch(self, dataset, epoch: int):
        """Held-out reconstruction quality: DPDist + squared chamfer means."""
        dps, chs = [], []
        dataset.reset()
        while dataset.has_next_batch():
            bd, _ = dataset.next_batch(augment=False)
            if bd.shape[0] == 0:
                continue
            x1, x2 = split_same_surface(bd)
            dp, ch = self._monitor(self.params, self.state,
                                   jnp.asarray(x1), jnp.asarray(x2))
            dps.append(float(dp))
            chs.append(float(ch))
        dp_m = float(np.mean(dps)) if dps else float("nan")
        ch_m = float(np.mean(chs)) if chs else float("nan")
        self.logger.log(f"eval DPDist {dp_m:f} chamfer {ch_m:f}")
        self.logger.metrics(self.global_step, epoch=epoch,
                            eval_dpdist=dp_m, eval_chamfer=ch_m)
        return dp_m, ch_m

    def fit(self, train_dataset, test_dataset=None, *, max_epoch: int,
            eval_every: int = 10, snapshot_every: int = 0,
            start_epoch: int = 0, archive_to=None):
        """Epoch loop with best-checkpoint keeping on the held-out loss of
        the TRAINED objective (dpdist for 'ours', chamfer for 'chamfer').

        Measured need: a 300-epoch 'ours' run diverged after ~epoch 250
        (eval dpdist 0.003 -> 0.63); the reference has no recovery either
        (it just saves every 2 epochs, train_multi_gpu:513-515).
        """
        from dpdist_tpu.train.checkpoint import (
            archive_checkpoint, archived_meta, archived_metric)

        best = float("inf")
        best_path = None
        if archive_to is not None:
            prev = archived_metric(archive_to, "eval_score")
            if (prev is not None
                    and archived_meta(archive_to, "opt_type") == self.opt_type):
                best = prev
                self.logger.log(f"archive {archive_to}: eval_score {prev:f} "
                                "is the bar to beat")
        # start_epoch > 0 resumes a crashed run with coherent epoch
        # numbering (total budget = max_epoch regardless of the restart).
        for epoch in range(start_epoch, max_epoch):
            self.train_epoch(train_dataset, epoch,
                             snapshot_every=snapshot_every)
            if test_dataset is not None and epoch % eval_every == 0:
                dp, ch = self.eval_epoch(test_dataset, epoch)
                score = dp if self.opt_type == "ours" else ch
                if np.isfinite(score) and score < best:
                    best = score
                    best_path = self.save(tag="best")
                    if archive_to is not None:
                        archive_checkpoint(
                            best_path, archive_to, metric=score,
                            metric_name="eval_score",
                            extra={"opt_type": self.opt_type})
                        self.logger.log(f"archived -> {archive_to} "
                                        f"(eval_score {score:f})")
            if epoch % 10 == 0:
                self.save(tag=self.global_step)
        final = self.save(tag=self.global_step)
        return best_path or final

    def save(self, tag):
        path = os.path.join(self.run_dir, f"aue_ckpt_{tag}")
        save_checkpoint(path, {"params": self.params, "state": self.state},
                        step=self.global_step,
                        metadata={"aue_config": self.acfg.to_json(),
                                  "opt_type": self.opt_type})
        self.logger.log(f"checkpoint saved: {path}")
        return path

    def restore(self, path):
        tree, step, _ = restore_checkpoint(
            path, {"params": jax.device_get(self.params),
                   "state": jax.device_get(self.state)}
        )
        self.params = replicate(tree["params"], self.mesh)
        self.state = replicate(tree["state"], self.mesh)
        if step:
            self.global_step = step
