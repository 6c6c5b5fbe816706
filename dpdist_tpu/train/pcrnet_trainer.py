"""Iterative PCRNet trainer — fully on-device refinement.

Reference: iterative_PCRNet.py (chamfer/EMD supervised) and
iterative_PCRNet_ours.py (frozen DPDist loss). The reference runs
MAX_LOOPS-1 host-side inference iterations per batch (sess.run + numpy
transform per loop, :414-468) and trains on the final iteration. Here the
whole refinement loop is a lax.scan inside ONE jitted SPMD step — the
host/device ping-pong (SURVEY §3.3) is gone.

Loss options (matching the reference experiment matrix,
run_train_and_eval_PCRNet.bash:65-74):
  'dpdist'  : frozen DPDist(transformed_source, template)
  'chamfer' : chamfer(template, transformed_source)
  'emd'     : Sinkhorn EMD(template, transformed_source)
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import PCRNetConfig, TrainConfig
from dpdist_tpu.losses import make_frozen_dpdist_loss
from dpdist_tpu.models import init_pcrnet
from dpdist_tpu.geometry import normalize_quat
from dpdist_tpu.geometry.se3 import (apply_transform, invert_transform,
                                     pose6_to_matrix)
from dpdist_tpu.models.pcrnet import pcrnet_refine
from dpdist_tpu.ops.chamfer import chamfer_distance
from dpdist_tpu.ops.emd import earth_mover_distance
from dpdist_tpu.parallel import make_mesh, replicate, shard_batch, build_sharded_train_step
from dpdist_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
from dpdist_tpu.train.logging import RunLogger
from dpdist_tpu.train.optim import make_optimizer


class PCRNetTrainer:
    def __init__(self, pcfg: PCRNetConfig, tcfg: TrainConfig, *,
                 loss_type: str = "chamfer",
                 dpdist: Optional[tuple] = None,  # (cfg, params, state)
                 train_single: bool = False,
                 action_reg: float = 0.0,
                 fp_reg: float = 0.0, fp_steps: int = 4,
                 run_dir: str = "runs/pcrnet", mesh=None,
                 logger: Optional[RunLogger] = None):
        assert loss_type in ("dpdist", "chamfer", "emd")
        if loss_type == "dpdist" and dpdist is None:
            raise ValueError("loss_type='dpdist' needs dpdist=(cfg, params, state)")
        if action_reg and not train_single:
            raise ValueError("action_reg needs --train_single (it penalizes "
                             "per-iteration poses, which only the full-BPTT "
                             "trajectory exposes to the loss)")
        self.pcfg = pcfg
        self.tcfg = tcfg
        self.loss_type = loss_type
        # fp_reg's aligned-state rollout needs the gt pose in the batch.
        self._needs_pose = bool(fp_reg)
        self.run_dir = run_dir
        self.mesh = mesh if mesh is not None else make_mesh(data=1)
        self.logger = logger or RunLogger(run_dir, config_json=pcfg.to_json(),
                                          name=f"train_pcrnet_{loss_type}")

        key = jax.random.PRNGKey(tcfg.seed)
        params, pstate = init_pcrnet(key, pcfg)
        self.params = replicate(params, self.mesh)
        self.state = replicate(pstate, self.mesh)
        self.optimizer = make_optimizer(tcfg, base_lr=tcfg.learning_rate)

        if loss_type == "dpdist":
            dcfg, dparams, dstate = dpdist
            dp_loss = make_frozen_dpdist_loss(dparams, dstate, dcfg)

        cfg = pcfg

        def single_loss(src, template):
            if loss_type == "dpdist":
                return dp_loss(src, template)
            if loss_type == "chamfer":
                return chamfer_distance(template, src, sqrt=True)
            return earth_mover_distance(template, src)

        def fp_penalty(p, s, batch):
            # Fixed-point conditioning (the round-5 drift objective the
            # horizon-extension candidates could not substitute for):
            # undo the ground-truth pose on the SOURCE — preserving the
            # sparse-split sampling asymmetry and the post-pose noise,
            # i.e. exactly the converged state the reference's no-stop
            # evaluator (results_itrPCRNet_no_stop.py:331-335) sits in
            # for its last ~42 iterations — then roll the policy from
            # that state and penalize every emitted action. Unlike
            # action_reg (late half of the 8-loop rollout from a RANDOM
            # pose, where correction is still legitimate), this rollout
            # starts at the true fixed point, so any action IS the
            # measured drift bias (results/fixed_point_bias.json). L1
            # magnitudes keep gradient alive at the ~1e-3 bias scale.
            pose6 = batch["pose6"].astype(batch["source"].dtype)
            aligned = apply_transform(batch["source"],
                                      invert_transform(pose6_to_matrix(pose6)))
            _, _, poses = pcrnet_refine(
                p, cfg, aligned, batch["template"], iterations=fp_steps,
                stop_gradient_iters=False, state=s, train=True)
            t_mag = jnp.linalg.norm(poses[..., :3], axis=-1)
            q = normalize_quat(poses[..., 3:7])
            r_mag = jnp.linalg.norm(q[..., 1:], axis=-1)
            return jnp.mean(t_mag + r_mag)

        def loss_fn(p, s, batch):
            template, source = batch["template"], batch["source"]
            if train_single:
                # --train_single parity: every refinement iteration is
                # supervised (iterative_PCRNet.py:313-318); gradients flow
                # through the whole unrolled refinement.
                _, _, poses, traj, new_s = pcrnet_refine(
                    p, cfg, source, template, iterations=cfg.max_loops,
                    stop_gradient_iters=False, return_trajectory=True,
                    state=s, train=True, return_state=True)
                losses = jax.vmap(lambda src: single_loss(src, template))(traj)
                loss = jnp.mean(losses)
                if action_reg:
                    # Fixed-point action regularizer (round-4 drift fix):
                    # the measured failure under the reference's no-stop
                    # 50-iteration protocol is a small per-case CONSTANT
                    # translation the policy keeps emitting at converged
                    # states (results/fixed_point_bias.json) — penalize
                    # the motion magnitude of the LATE half of the
                    # rollout, where a converged policy should output the
                    # identity. L1 (norms, not squares) so ~1e-3 biases
                    # still see gradient.
                    half = cfg.max_loops // 2
                    t_mag = jnp.linalg.norm(poses[half:, :, :3], axis=-1)
                    q = normalize_quat(poses[half:, :, 3:7])
                    # |vec(q)| = sin(angle/2): rotation deviation from
                    # identity, sign-invariant
                    r_mag = jnp.linalg.norm(q[..., 1:], axis=-1)
                    loss = loss + action_reg * jnp.mean(t_mag + r_mag)
                if fp_reg:
                    loss = loss + fp_reg * fp_penalty(p, s, batch)
                return loss, new_s
            src_out, T, _, new_s = pcrnet_refine(
                p, cfg, source, template, iterations=cfg.max_loops,
                stop_gradient_iters=True, state=s, train=True,
                return_state=True)
            loss = single_loss(src_out, template)
            if fp_reg:
                loss = loss + fp_reg * fp_penalty(p, s, batch)
            return loss, new_s

        init_opt, self._step = build_sharded_train_step(loss_fn, self.optimizer,
                                                        self.mesh)
        self.opt_state = init_opt(params)
        self.global_step = 0

        # chamfer is always logged for comparison (ours trainer logs it too,
        # iterative_PCRNet_ours.py:253).
        def monitor(p, s, template, source):
            src_out, T, _ = pcrnet_refine(p, cfg, source, template,
                                          iterations=cfg.max_loops, state=s)
            return chamfer_distance(template, src_out, sqrt=True)

        self._monitor = jax.jit(monitor)
        # Fixed probe batch for the chamfer monitor: the reference logs
        # chamfer on the current train batch (iterative_PCRNet_ours.py:253),
        # a noisy, biased signal; a batch frozen at the first epoch makes
        # the logged curve comparable across epochs.
        self._probe = None

    def train_step(self, template: np.ndarray, source: np.ndarray,
                   pose6: Optional[np.ndarray] = None):
        batch = {"template": template, "source": source}
        if self._needs_pose:
            if pose6 is None:
                raise ValueError("fp_reg training needs the gt pose6 batch")
            batch["pose6"] = pose6
        batch = shard_batch(batch, self.mesh)
        self.params, self.state, self.opt_state, metrics = self._step(
            self.params, self.state, self.opt_state, batch
        )
        self.global_step += 1
        return metrics

    def train_epoch(self, dataset, epoch: int, *, batches_per_epoch: int = 32,
                    random_points_prob: float = 0.0, noise_prob: float = 0.0,
                    occlusion_fraction: float = 0.0):
        losses = []
        gnorms = []
        for _ in range(batches_per_epoch):
            template, source, pose6 = dataset.sample_batch(
                self.tcfg.batch_size, random_points_prob=random_points_prob,
                noise_prob=noise_prob, occlusion_fraction=occlusion_fraction,
            )
            if self._probe is None:
                self._probe = (jnp.asarray(template), jnp.asarray(source))
            m = self.train_step(template, source, pose6=pose6)
            losses.append(float(m["loss"]))
            gnorms.append(float(m["grad_norm"]))
        mean_loss = float(np.mean(losses))
        ch = float(self._monitor(self.params, self.state, *self._probe))
        self.logger.log(f" ---- epoch: {epoch + 1:03d} ---- mean loss: "
                        f"{mean_loss:f} (chamfer {ch:f})")
        # grad-norm instrumentation for the full-BPTT stability question
        # (pre-clip norm: the metric is computed from the raw psum'd grads).
        self.logger.metrics(self.global_step, epoch=epoch,
                            train_loss=mean_loss, chamfer=ch,
                            grad_norm_mean=float(np.mean(gnorms)),
                            grad_norm_max=float(np.max(gnorms)))
        return mean_loss

    def evaluate(self, dataset, *, num_cases: int = 64,
                 iterations: int = None, report_dir: str = None):
        """Periodic in-training evaluation (reference eval_one_epoch,
        iterative_PCRNet_ours.py:336-338) via the standard protocol."""
        from dpdist_tpu.eval.registration import evaluate_registration

        rep = evaluate_registration(
            jax.device_get(self.params), self.pcfg, dataset,
            num_cases=num_cases,
            iterations=iterations or self.pcfg.eval_iterations,
            report_dir=report_dir, state=jax.device_get(self.state),
        )
        self.logger.log(
            f"eval: rot {rep['rot_err_mean_deg']:.2f} deg, trans "
            f"{rep['trans_err_mean']:.4f}, acc@(5,0.05) "
            f"{rep['acc_rot5.0_trans0.05']:.3f}"
        )
        self.logger.metrics(self.global_step,
                            eval_rot_err=rep["rot_err_mean_deg"],
                            eval_trans_err=rep["trans_err_mean"])
        return rep

    def fit(self, train_dataset, *, epochs: int, batches_per_epoch: int = 32,
            eval_dataset=None, eval_every: int = 10, eval_cases: int = 64,
            select_family: Optional[str] = None,
            archive_to: Optional[str] = None, **epoch_kw):
        """Train with best-checkpoint keeping (the reference saves
        best_model.ckpt every epoch, iterative_PCRNet_ours.py:335).

        Registration accuracy at tight tolerances is high-variance across
        epochs; final-epoch evaluation measured a 28-point swing at the
        (2.5°, 0.05) bucket between otherwise identical runs, so the best
        validation rotation error decides which checkpoint survives.

        select_family: on multi-family datasets the POOLED rotation error
        is diluted by rotationally symmetric families (sphere/cylinder/
        torus have no identifiable pose), which makes checkpoint
        selection nearly blind — a 1200-epoch run whose final policy had
        collapsed still looked mid-pack on the pooled metric (round 3,
        results/multifam_r3/ts1200_*). Selecting on one identifiable
        family's slice (e.g. 'chair', via the evaluator's per_family
        report) restores a sharp signal. Returns the best checkpoint path
        (or the final one when no eval_dataset is given).
        """
        from dpdist_tpu.train.checkpoint import (
            archive_checkpoint, archived_meta, archived_metric)

        best_err = float("inf")
        best_path = None
        if archive_to is not None:
            # Only trust the archived bar under the SAME selection
            # protocol (metric family) — a chair-slice err and a pooled
            # err are not comparable (symmetry dilution, docstring above).
            prev = archived_metric(archive_to, "select_err")
            prev_fam = archived_meta(archive_to, "select_family")
            if prev is not None and prev_fam == (select_family or ""):
                best_err = prev
                self.logger.log(f"archive {archive_to}: select_err "
                                f"{prev:f} is the bar to beat")
        for epoch in range(epochs):
            self.train_epoch(train_dataset, epoch,
                             batches_per_epoch=batches_per_epoch, **epoch_kw)
            if eval_dataset is not None and (epoch + 1) % eval_every == 0:
                rep = self.evaluate(eval_dataset, num_cases=eval_cases,
                                    iterations=self.pcfg.max_loops * 2)
                err = rep["rot_err_mean_deg"]
                if select_family:
                    fam = rep.get("per_family", {}).get(select_family)
                    if fam is None:
                        # Never substitute the pooled metric: on
                        # multi-family sets it is symmetry-diluted and
                        # systematically lower, so it could steal the
                        # 'best' slot from a real per-family value.
                        self.logger.log(
                            f"eval report lacks family {select_family!r}; "
                            "skipping best-ckpt comparison this epoch")
                        continue
                    err = fam["rot_err_mean_deg"]
                if err < best_err:
                    best_err = err
                    best_path = self.save(tag="best")
                    if archive_to is not None:
                        archive_checkpoint(
                            best_path, archive_to, metric=err,
                            metric_name="select_err",
                            extra={"select_family": select_family or ""})
                        self.logger.log(f"archived -> {archive_to} "
                                        f"(select_err {err:f})")
        final = self.save(tag="final")
        return best_path or final

    def save(self, tag):
        path = os.path.join(self.run_dir, f"pcrnet_ckpt_{tag}")
        save_checkpoint(path,
                        {"params": self.params, "state": self.state},
                        step=self.global_step,
                        metadata={"pcrnet_config": self.pcfg.to_json(),
                                  "loss_type": self.loss_type})
        self.logger.log(f"checkpoint saved: {path}")
        return path

    def restore(self, path):
        from dpdist_tpu.train.checkpoint import restore_params_maybe_state

        params, state, step = restore_params_maybe_state(
            path, jax.device_get(self.params), jax.device_get(self.state))
        if state is not None:
            self.state = replicate(state, self.mesh)
        self.params = replicate(params, self.mesh)
        if step:
            self.global_step = step
