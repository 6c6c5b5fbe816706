"""DPDist training driver.

The TPU-native equivalent of train() phase 1
(train_multi_gpu_pc_compare_dist.py:186-357): one jitted SPMD train step
over a data-parallel mesh, epoch loop over the surface-pair dataset with
the reference's batch-assembly semantics, periodic eval + checkpointing.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax

from dpdist_tpu.configs import DPDistConfig, TrainConfig
from dpdist_tpu.data.batching import assemble_dpdist_batch
from dpdist_tpu.losses import l1_sample_loss
from dpdist_tpu.models import init_dpdist, apply_dpdist
from dpdist_tpu.parallel import make_mesh, replicate, shard_batch, build_sharded_train_step
from dpdist_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
from dpdist_tpu.train.logging import RunLogger
from dpdist_tpu.train.optim import make_optimizer


class DPDistTrainer:
    def __init__(self, model_cfg: DPDistConfig, train_cfg: TrainConfig,
                 *, run_dir: str = "runs/dpdist", mesh=None,
                 logger: Optional[RunLogger] = None):
        self.mcfg = model_cfg
        self.tcfg = train_cfg
        self.run_dir = run_dir
        self.mesh = mesh if mesh is not None else make_mesh(data=1)
        ndata = self.mesh.shape["data"]
        if train_cfg.batch_size % ndata:
            raise ValueError(
                f"batch_size {train_cfg.batch_size} not divisible by data axis {ndata}"
            )
        self.logger = logger or RunLogger(
            run_dir,
            config_json='{"model": %s, "train": %s}' % (model_cfg.to_json(),
                                                        train_cfg.to_json()),
        )

        key = jax.random.PRNGKey(train_cfg.seed)
        params, state = init_dpdist(key, model_cfg)
        self.params = replicate(params, self.mesh)
        self.state = replicate(state, self.mesh)
        self.optimizer = make_optimizer(train_cfg)

        # The train step is a grad context: 'auto' dispatch resolves to
        # 'table' there (1.29x over the fused 'mfv' kernel — the one-
        # direction l1 loss lets XLA DCE the unused direction, which the
        # opaque 2B kernel prevents; models/dpdist.resolve_for_grad).
        # Monitors/eval below keep the original cfg (forward-only).
        from dpdist_tpu.models.dpdist import resolve_for_grad

        mcfg = resolve_for_grad(model_cfg)

        def loss_fn(p, s, batch):
            pcA, pcB, labels = batch["pcA"], batch["pcB"], batch["labels"]
            noise = batch.get("noise")
            pred_AB, _, new_state = apply_dpdist(
                p, s, mcfg, pcA, pcB, noise=noise, train=True
            )
            return l1_sample_loss(pred_AB, labels), new_state

        self._loss_fn = loss_fn
        init_opt, self._step = build_sharded_train_step(
            loss_fn, self.optimizer, self.mesh
        )
        self.opt_state = init_opt(params)
        self.global_step = 0
        self._np_rng = np.random.default_rng(train_cfg.seed + 1)

    # ------------------------------------------------------------------

    def _make_batch(self, batch_data, batch_labels):
        pcA, pcB, labels = assemble_dpdist_batch(batch_data, batch_labels)
        batch = {"pcA": pcA, "pcB": pcB, "labels": labels}
        noise = None
        if (self.tcfg.encoder_occlusion > 0
                and self.tcfg.encoder_occlusion_prob > 0):
            # Occlusion-robust frozen-distance training: the ENCODER sees
            # an occluded/duplicate-refilled conditioning cloud, the labels
            # stay vs the true surface. Routed through the additive-noise
            # channel (apply_dpdist corrupts the encoder input only,
            # pcA_enc = pcA + noise — the queries stay exact).
            from dpdist_tpu.data.registration import add_occlusions_np

            sel = (self._np_rng.uniform(size=pcA.shape[0])
                   < self.tcfg.encoder_occlusion_prob)
            occluded = pcA.copy()
            if sel.any():
                occluded[sel] = add_occlusions_np(
                    pcA[sel], self.tcfg.encoder_occlusion, self._np_rng)
            # always emit the channel (zeros when nothing selected) so the
            # batch pytree structure — and the compiled step — is stable
            noise = occluded - pcA
        if self.tcfg.add_noise > 0:
            gauss = (self._np_rng.standard_normal(pcA.shape)
                     * self.tcfg.add_noise).astype(np.float32)
            noise = gauss if noise is None else noise + gauss
        if noise is not None:
            batch["noise"] = noise.astype(np.float32)
        return shard_batch(batch, self.mesh)

    def train_step(self, batch_data, batch_labels):
        batch = self._make_batch(batch_data, batch_labels)
        self.params, self.state, self.opt_state, metrics = self._step(
            self.params, self.state, self.opt_state, batch
        )
        self.global_step += 1
        return metrics

    def train_epoch(self, dataset, epoch: int, *, prefetch: bool = True):
        # Keep per-step metrics on device and fetch once per epoch: on
        # remote-relay platforms a per-step float() costs a full RTT.
        # Host batch assembly overlaps device execution via the prefetcher.
        device_losses = []
        if prefetch:
            from dpdist_tpu.data.prefetch import PrefetchingLoader

            batches = PrefetchingLoader(dataset, augment=self.tcfg.augment).epoch()
        else:
            def _iter():
                dataset.reset()
                while dataset.has_next_batch():
                    yield dataset.next_batch(augment=self.tcfg.augment)

            batches = _iter()
        for bd, bl in batches:
            if bd.shape[0] < self.tcfg.batch_size:
                # the sharded step is compiled for exactly batch_size
                # (reference asserts BATCH_SIZE % NUM_GPUS too); drop tails
                continue
            m = self.train_step(bd, bl)
            device_losses.append(m["loss"])
        losses = [float(np.asarray(l)) for l in device_losses]
        if not losses:
            raise ValueError(
                f"epoch {epoch} produced no full batches — check the "
                f"category filter and that batch_size "
                f"({self.tcfg.batch_size}) does not exceed the split size"
            )
        if not all(np.isfinite(l) for l in losses):
            # Failure detection (the reference has none, SURVEY §5): stop
            # at the first diverged step with enough context to bisect.
            bad = next(i for i, l in enumerate(losses) if not np.isfinite(l))
            raise FloatingPointError(
                f"non-finite train loss at epoch {epoch}, batch {bad} "
                f"(step ~{self.global_step - len(losses) + bad}); losses "
                f"around failure: {losses[max(0, bad - 2): bad + 1]}"
            )
        mean_loss = float(np.mean(losses))
        self.logger.log(f" ---- epoch: {epoch + 1:03d} ---- mean loss: {mean_loss:f}")
        self.logger.metrics(self.global_step, epoch=epoch, train_loss=mean_loss)
        return mean_loss

    def _eval_loss_fn(self):
        # Cached jitted eval: a fresh closure per eval_epoch call would
        # recompile every time.
        if not hasattr(self, "_eval_loss"):
            mcfg = self.mcfg

            @jax.jit
            def eval_loss(p, s, pcA, pcB, labels):
                pred_AB, _, _ = apply_dpdist(p, s, mcfg, pcA, pcB, train=False)
                return l1_sample_loss(pred_AB, labels)

            self._eval_loss = eval_loss
        return self._eval_loss

    def eval_epoch(self, dataset, epoch: int):
        """eval_one_epoch_3d parity: L1 on the held-out split, no augment."""
        state = self.state
        eval_loss = self._eval_loss_fn()
        losses = []
        dataset.reset()
        while dataset.has_next_batch():
            bd, bl = dataset.next_batch(augment=False)
            if bd.shape[0] == 0:
                continue
            # Ragged batches are fine here: eval jits per shape and a test
            # split has at most two distinct batch shapes.
            pcA, pcB, labels = assemble_dpdist_batch(bd, bl)
            losses.append(float(eval_loss(self.params, state, pcA, pcB, labels)))
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        self.logger.log(f"eval mean loss: {mean_loss:f}")
        self.logger.metrics(self.global_step, epoch=epoch, eval_loss=mean_loss)
        return mean_loss

    # ------------------------------------------------------------------

    def fit(self, train_dataset, test_dataset=None, *, max_epoch=None,
            eval_every: int = 10, archive_to: Optional[str] = None):
        """Epoch loop with periodic eval; keeps ckpt_best on the lowest
        held-out loss (the convergence runs previously did this by hand).

        archive_to: optional base path (e.g. results/dpdist_multi) to
        copy ckpt_best to on every improvement; `best` initializes from
        the archive's recorded eval_l1 so a resumed run only overwrites
        the archive with a strictly better checkpoint."""
        from dpdist_tpu.train.checkpoint import archive_checkpoint, archived_metric

        max_epoch = max_epoch if max_epoch is not None else self.tcfg.max_epoch
        best = float("inf")
        if archive_to is not None:
            prev = archived_metric(archive_to, "eval_l1")
            if prev is not None:
                best = prev
                self.logger.log(f"archive {archive_to}: eval_l1 {prev:f} "
                                "is the bar to beat")
        for epoch in range(max_epoch):
            self.train_epoch(train_dataset, epoch)
            if (epoch % eval_every == 0) and test_dataset is not None:
                ev = self.eval_epoch(test_dataset, epoch)
                if np.isfinite(ev) and ev < best:
                    best = ev
                    path = self.save(tag="best")
                    if archive_to is not None:
                        archive_checkpoint(path, archive_to, metric=ev,
                                           metric_name="eval_l1")
                        self.logger.log(f"archived -> {archive_to} "
                                        f"(eval_l1 {ev:f})")
            if epoch % self.tcfg.checkpoint_every_epochs == 0:
                self.save(tag=self.global_step)
        self.save(tag=self.global_step)
        return best

    def save(self, tag):
        path = os.path.join(self.run_dir, f"ckpt_{tag}")
        save_checkpoint(path, {"params": self.params, "state": self.state},
                        step=self.global_step,
                        metadata={"model_config": self.mcfg.to_json()})
        self.logger.log(f"checkpoint saved: {path}")
        return path

    def restore(self, path: Optional[str] = None):
        path = path or latest_checkpoint(self.run_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.run_dir}")
        tree, step, _ = restore_checkpoint(
            path, {"params": jax.device_get(self.params),
                   "state": jax.device_get(self.state)}
        )
        self.params = replicate(tree["params"], self.mesh)
        self.state = replicate(tree["state"], self.mesh)
        if step:
            self.global_step = step
        self.logger.log(f"restored checkpoint: {path} (step {step})")
