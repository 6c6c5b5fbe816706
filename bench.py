#!/usr/bin/env python3
"""Benchmark: DPDist point-cloud pairs/sec/chip (canonical config).

Measures on the default accelerator:
  * the full bidirectional DPDist forward (3DmFV encode both clouds ->
    local patches -> implicit decoder both directions) at the canonical
    np=64 and at np=256;
  * the full training step (forward + backward + Adam) at np=64;
  * Pallas-vs-XLA 3DmFV parity on the live device (max abs diff), so a
    kernel numerics regression cannot hide from the round's bench capture.

Prints exactly ONE JSON line. The required driver fields are
metric/value/unit/vs_baseline (the headline forward throughput); the
extra fields carry the secondary measurements.

vs_baseline denominator: MEASURED, not estimated — the literal reference
math (the tests/oracles.py re-execution of the TF1 graph, float32) timed
on this host at the reference config (batch 16, np=64) by
scripts/measure_baseline.py. See BASELINE.md for the measurement record
and the host caveats (single CPU core).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_PROBE_SRC = """
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
"""


def _wait_for_relay(window_s=1800, probe_timeout=90, sleep_s=120):
    """The axon TPU relay can be down (jax.devices() then hangs forever,
    which would hang the driver's bench capture). Probe it with bounded
    subprocesses; return True once a tiny dispatch completes end-to-end,
    False if the window expires."""
    deadline = time.time() + window_s
    while True:
        try:
            subprocess.run([sys.executable, "-c", _PROBE_SRC], check=True,
                           timeout=probe_timeout,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.time() >= deadline:
                return False
            time.sleep(sleep_s)

# scripts/measure_baseline.py on this host (1-core AVX512 CPU, OpenBLAS):
# {"pairs_per_sec": 12.79, "ms_per_step": 1250.61, "batch": 16, "iters": 10}
BASELINE_PAIRS_PER_SEC = 12.79
# Retired round-1 denominator: estimated TF1 single-GPU throughput
# (BASELINE.md). Emitted alongside so cross-round consumers can pick a
# denominator explicitly instead of conflating the two under one name.
BASELINE_EST_GPU_PAIRS_PER_SEC = 533.0


def _time_pairs_per_sec(fn, batch, iters=30):
    np.asarray(fn())  # warmup/compile; np.asarray forces a synchronous fetch
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return batch * iters / (time.perf_counter() - t0)


def main():
    if os.environ.get("DPDIST_PLATFORM", "").lower() in ("cpu",):
        # Actually run on CPU (the sitecustomize pins the default
        # platform to the axon relay and ignores JAX_PLATFORMS; without
        # this a "CPU smoke" would silently contend the TPU).
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        if not _wait_for_relay():
            # Emit an explicit, machine-readable failure rather than
            # hanging: the chip is unreachable, not slow. Last healthy
            # capture: BENCH_r03.json.
            print(json.dumps({
                "metric": "dpdist_pairs_per_sec_per_chip",
                "value": 0.0,
                "unit": "pairs/s",
                "vs_baseline": 0.0,
                "error": ("TPU relay unreachable for 30 min (probe "
                          "dispatch never completed); not a model "
                          "regression - see BENCH_r03.json for the last "
                          "healthy capture"),
            }))
            return
    import jax
    import jax.numpy as jnp
    from dpdist_tpu.configs import DPDistConfig, TrainConfig
    from dpdist_tpu.models import init_dpdist, apply_dpdist
    from dpdist_tpu.losses import l1_sample_loss
    from dpdist_tpu.train.optim import make_optimizer

    cfg = DPDistConfig()  # canonical: 512 gaussians, k=5, mlp 1024^3, np=64
    batch = 256           # throughput batch; pairs/sec is batch-normalized
    params, state = init_dpdist(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)

    def clouds(n_point):
        a = jnp.asarray(rng.uniform(-0.8, 0.8, (batch, n_point, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-0.8, 0.8, (batch, n_point, 3)).astype(np.float32))
        return a, b

    def make_pair_eval(c):
        @jax.jit
        def pair_eval(p, s, a, b):
            pred_AB, pred_BA, _ = apply_dpdist(p, s, c, a, b, train=False)
            return (jnp.mean(pred_AB[..., 0], -1) + jnp.mean(pred_BA[..., 0], -1)) / 2
        return pair_eval

    # ---- headline: forward pairs/s at np=64
    pcA, pcB = clouds(cfg.num_point)
    fwd = make_pair_eval(cfg)
    fwd_64 = _time_pairs_per_sec(lambda: fwd(params, state, pcA, pcB), batch)

    # ---- bf16 serving config (table + decoder in bf16; 3DmFV exact f32)
    cfg16 = DPDistConfig(dtype="bfloat16")
    fwd16 = make_pair_eval(cfg16)
    fwd_bf16 = _time_pairs_per_sec(lambda: fwd16(params, state, pcA, pcB),
                                   batch)

    # ---- forward pairs/s at np=256 (amortizes per-pair fixed costs)
    cfg256 = DPDistConfig(num_point=256)
    pcA256, pcB256 = clouds(256)
    fwd256 = make_pair_eval(cfg256)
    fwd_256 = _time_pairs_per_sec(
        lambda: fwd256(params, state, pcA256, pcB256), batch, iters=15)

    # ---- training step (forward + backward + Adam) at np=64
    # Grad contexts resolve 'auto' dispatch to 'table' like the shipped
    # trainers do (models/dpdist.resolve_for_grad; idle A/B
    # results/idle_r5/ab_grad_paths.jsonl).
    from dpdist_tpu.models.dpdist import resolve_for_grad

    gcfg = resolve_for_grad(cfg)
    gcfg16 = resolve_for_grad(cfg16)
    optimizer = make_optimizer(TrainConfig(batch_size=batch))
    opt_state = optimizer.init(params)
    labels = jnp.asarray(
        np.abs(rng.uniform(0, 0.3, (batch, cfg.num_point))).astype(np.float32))

    @jax.jit
    def train_step(p, s, o, a, b, lab):
        def loss_fn(pp, ss):
            pred_AB, _, new_s = apply_dpdist(pp, ss, gcfg, a, b, train=True)
            return l1_sample_loss(pred_AB, lab), new_s

        (loss, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, s)
        updates, new_o = optimizer.update(grads, o, p)
        import optax

        return optax.apply_updates(p, updates), new_s, new_o, loss

    def step_once():
        nonlocal params, state, opt_state
        params, state, opt_state, loss = train_step(
            params, state, opt_state, pcA, pcB, labels)
        return loss

    train_64 = _time_pairs_per_sec(step_once, batch, iters=20)

    # ---- bf16 mixed-precision training step (f32 master weights, bf16
    # table + decoder compute via cfg.dtype)
    @jax.jit
    def train_step_bf16(p, s, o, a, b, lab):
        def loss_fn(pp, ss):
            pred_AB, _, new_s = apply_dpdist(pp, ss, gcfg16, a, b, train=True)
            return l1_sample_loss(pred_AB, lab), new_s

        (loss, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, s)
        updates, new_o = optimizer.update(grads, o, p)
        import optax

        return optax.apply_updates(p, updates), new_s, new_o, loss

    def step16_once():
        nonlocal params, state, opt_state
        params, state, opt_state, loss = train_step_bf16(
            params, state, opt_state, pcA, pcB, labels)
        return loss

    train_64_bf16 = _time_pairs_per_sec(step16_once, batch, iters=20)

    # ---- frozen-loss input gradients (the registration/AUE supervision
    # path): d dpdist(A, B) / d(A, B) through the frozen network. This is
    # the path where the backward used to re-materialize the (B, V,
    # k^3*C) patch table in HBM; the round-3 Pallas VJP keeps it in VMEM.
    from dpdist_tpu.models.dpdist import dpdist_distance

    @jax.jit
    def frozen_grad(p, s, a, b):
        return jax.grad(
            lambda aa, bb: dpdist_distance(p, s, gcfg, aa, bb), (0, 1)
        )(a, b)

    frozen_64 = _time_pairs_per_sec(
        lambda: frozen_grad(params, state, pcA, pcB)[0], batch, iters=20)

    # ---- src-only frozen grad: the ACTUAL downstream hot path. PCRNet
    # and AUE backprop the frozen loss only into the transformed source
    # (iterative_PCRNet_ours.py:255-257); the template adjoint above is
    # dead work kept for the symmetric-API measurement.
    @jax.jit
    def frozen_grad_src(p, s, a, b):
        return jax.grad(
            lambda aa: dpdist_distance(p, s, gcfg, aa, b))(a)

    frozen_src_64 = _time_pairs_per_sec(
        lambda: frozen_grad_src(params, state, pcA, pcB), batch, iters=20)

    # ---- full PCRNet train step (VERDICT r3 #4): canonical 8-loop
    # refinement + frozen DPDist loss + Adam, at the reference batch
    # size 16 (iterative_PCRNet_ours.py trains this exact composition).
    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.models import init_pcrnet
    from dpdist_tpu.models.pcrnet import pcrnet_refine
    from dpdist_tpu.losses import make_frozen_dpdist_loss
    import optax

    pcfg = PCRNetConfig(num_point=cfg.num_point)
    pparams, pstate = init_pcrnet(jax.random.PRNGKey(1), pcfg)
    dp_loss = make_frozen_dpdist_loss(params, state, cfg)
    pcr_batch = 16
    popt = make_optimizer(TrainConfig(batch_size=pcr_batch))
    popt_state = popt.init(pparams)
    src16 = pcA[:pcr_batch]
    tmpl16 = pcB[:pcr_batch]

    @jax.jit
    def pcr_step(p, ps, o, src, tmpl):
        def lf(pp, ss):
            src_out, _, _, new_s = pcrnet_refine(
                pp, pcfg, src, tmpl, iterations=pcfg.max_loops,
                stop_gradient_iters=True, state=ss, train=True,
                return_state=True)
            return dp_loss(src_out, tmpl), new_s

        (loss, new_s), grads = jax.value_and_grad(lf, has_aux=True)(p, ps)
        updates, new_o = popt.update(grads, o, p)
        return optax.apply_updates(p, updates), new_s, new_o, loss

    def pcr_once():
        nonlocal pparams, pstate, popt_state
        pparams, pstate, popt_state, loss = pcr_step(
            pparams, pstate, popt_state, src16, tmpl16)
        return loss

    pcr_16 = _time_pairs_per_sec(pcr_once, pcr_batch, iters=30)

    # ---- FULL-BPTT PCRNet train step (VERDICT r4 Weak #4 / Next #5):
    # the repo's actual flagship recipe (--train_single --grad_clip 1.0):
    # every refinement iteration supervised by the frozen DPDist loss,
    # gradients through the whole 8-iteration unroll
    # (iterative_PCRNet.py:313-318 train_single +
    # iterative_PCRNet_ours.py:248-257 frozen-loss composition). The
    # pcr_16 field above is the reference-DEFAULT last-iteration step
    # (stop_gradient_iters=True); they are different computations and
    # carry different names on purpose.
    popt_bptt = make_optimizer(TrainConfig(batch_size=pcr_batch,
                                           grad_clip=1.0))
    popt_bptt_state = popt_bptt.init(pparams)

    @jax.jit
    def pcr_bptt_step(p, ps, o, src, tmpl):
        def lf(pp, ss):
            _, _, _, traj, new_s = pcrnet_refine(
                pp, pcfg, src, tmpl, iterations=pcfg.max_loops,
                stop_gradient_iters=False, return_trajectory=True,
                state=ss, train=True, return_state=True)
            losses = jax.vmap(lambda so: dp_loss(so, tmpl))(traj)
            return jnp.mean(losses), new_s

        (loss, new_s), grads = jax.value_and_grad(lf, has_aux=True)(p, ps)
        updates, new_o = popt_bptt.update(grads, o, p)
        return optax.apply_updates(p, updates), new_s, new_o, loss

    pparams2, pstate2 = init_pcrnet(jax.random.PRNGKey(1), pcfg)

    def pcr_bptt_once():
        nonlocal pparams2, pstate2, popt_bptt_state
        pparams2, pstate2, popt_bptt_state, loss = pcr_bptt_step(
            pparams2, pstate2, popt_bptt_state, src16, tmpl16)
        return loss

    pcr_bptt_16 = _time_pairs_per_sec(pcr_bptt_once, pcr_batch, iters=30)

    # ---- bf16 forward batch scaling (VERDICT r3 #8): does serving
    # throughput climb past the per-dispatch floor by batching?
    def fwd16_at(B):
        a = jnp.asarray(rng.uniform(-0.8, 0.8, (B, cfg.num_point, 3))
                        .astype(np.float32))
        b = jnp.asarray(rng.uniform(-0.8, 0.8, (B, cfg.num_point, 3))
                        .astype(np.float32))
        return _time_pairs_per_sec(
            lambda: fwd16(params, state, a, b), B, iters=15)

    fwd_bf16_b512 = fwd16_at(512)
    fwd_bf16_b1024 = fwd16_at(1024)

    # ---- on-chip Pallas-vs-XLA parity for EVERY kernel (VERDICT r2 #6):
    # a Mosaic regression on real TPU must show up in the round's capture.
    on_cpu = jax.devices()[0].platform == "cpu"

    def parity(fn):
        try:
            return fn()
        except Exception as e:  # parity failure must be visible, not fatal
            return f"ERROR: {e}"

    def p_threedmfv():
        from dpdist_tpu.ops.threedmfv import threedmfv
        from dpdist_tpu.kernels.threedmfv_pallas import threedmfv_pallas

        pts = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 1024, 3)).astype(np.float32))
        a = np.asarray(threedmfv_pallas(pts, interpret=on_cpu))
        b = np.asarray(threedmfv(pts, impl="xla"))
        return float(np.abs(a - b).max())

    def p_table_gather():
        from dpdist_tpu.kernels.table_gather_pallas import table_gather
        from dpdist_tpu.ops.voxel import voxel_assign, extract_patches, gather_patches

        fv = jnp.asarray(rng.standard_normal((4, 512, 20)).astype(np.float32))
        q = jnp.asarray(rng.uniform(-1.1, 1.1, (4, 64, 3)).astype(np.float32))
        vox, mask, _ = voxel_assign(q, 8)
        a = np.asarray(table_gather(fv, vox, 8, 5, interpret=on_cpu))
        b = np.asarray(gather_patches(extract_patches(fv, 8, 5), vox, None))
        return float(np.abs(a - b).max())  # bit-exact: expect 0.0

    def p_chamfer():
        from dpdist_tpu.kernels.chamfer_pallas import nn_min_sqdist_pallas
        from dpdist_tpu.ops.chamfer import nn_distance

        a_pts = jnp.asarray(rng.standard_normal((2, 700, 3)).astype(np.float32))
        b_pts = jnp.asarray(rng.standard_normal((2, 900, 3)).astype(np.float32))
        a = np.asarray(nn_min_sqdist_pallas(a_pts, b_pts, interpret=on_cpu))
        b = np.asarray(nn_distance(a_pts, b_pts)[0])
        return float(np.abs(a - b).max())

    def p_mfv_x():
        # r5 fused front half (points -> decoder input) vs the XLA
        # composition; encode-math class tolerance (~1e-5 after
        # normalization, like p_threedmfv).
        from dpdist_tpu.kernels.mfv_gather_pallas import mfv_table_gather_x
        from dpdist_tpu.kernels.table_gather_pallas import table_gather_x
        from dpdist_tpu.ops.threedmfv import threedmfv

        pts = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 64, 3)).astype(np.float32))
        q = jnp.asarray(rng.uniform(-1.1, 1.1, (4, 64, 3)).astype(np.float32))
        a = np.asarray(mfv_table_gather_x(pts, q, 512, 0.125, 8, 5,
                                          interpret=on_cpu))
        fv = threedmfv(pts, 512, 0.125, impl="xla")
        b = np.asarray(table_gather_x(fv, q, 8, 5, interpret=on_cpu))
        return float(np.abs(a - b).max())

    def p_fused_forward():
        # bf16 serving kernel vs the composed bf16 path (same numerics
        # class; tolerance asserted by the driver-facing field value).
        pf = make_pair_eval(DPDistConfig(dtype="bfloat16", fused_gather="full"))
        a = np.asarray(pf(params, state, pcA, pcB))
        b = np.asarray(fwd16(params, state, pcA, pcB))
        return float(np.abs(a - b).max())

    print(json.dumps({
        "metric": "dpdist_pairs_per_sec_per_chip",
        "value": round(fwd_64, 2),
        "unit": "pairs/s",
        # vs_baseline == vs_baseline_measured_host; the explicitly-named
        # twins exist so cross-round comparisons can't conflate the
        # measured-host denominator with round-1's GPU estimate (ADVICE r2).
        "vs_baseline": round(fwd_64 / BASELINE_PAIRS_PER_SEC, 2),
        "vs_baseline_measured_host": round(fwd_64 / BASELINE_PAIRS_PER_SEC, 2),
        "vs_baseline_est_gpu": round(fwd_64 / BASELINE_EST_GPU_PAIRS_PER_SEC, 2),
        "baseline_measured_pairs_per_sec": BASELINE_PAIRS_PER_SEC,
        "train_step_pairs_per_sec": round(train_64, 2),
        "train_step_bf16_pairs_per_sec": round(train_64_bf16, 2),
        "frozen_loss_grad_pairs_per_sec": round(frozen_64, 2),
        "frozen_loss_grad_src_pairs_per_sec": round(frozen_src_64, 2),
        # Two DIFFERENT computations, two names (VERDICT r4 Weak #4):
        # ..._train_step_... = reference-default LAST-ITERATION training
        # (stop_gradient_iters=True); ..._train_single_bptt_... = the
        # repo's flagship --train_single recipe (full 8-iteration BPTT,
        # every iteration supervised, grad_clip 1.0).
        "pcrnet_train_step_pairs_per_sec": round(pcr_16, 2),
        "pcrnet_train_single_bptt_pairs_per_sec": round(pcr_bptt_16, 2),
        "fwd_bf16_pairs_per_sec": round(fwd_bf16, 2),
        "fwd_bf16_b512_pairs_per_sec": round(fwd_bf16_b512, 2),
        "fwd_bf16_b1024_pairs_per_sec": round(fwd_bf16_b1024, 2),
        "fwd_np256_pairs_per_sec": round(fwd_256, 2),
        "threedmfv_pallas_vs_xla_maxdiff": parity(p_threedmfv),
        "table_gather_pallas_vs_xla_maxdiff": parity(p_table_gather),
        "chamfer_pallas_vs_xla_maxdiff": parity(p_chamfer),
        "mfv_x_pallas_vs_xla_maxdiff": parity(p_mfv_x),
        "fused_forward_vs_composed_bf16_maxdiff": parity(p_fused_forward),
    }))


if __name__ == "__main__":
    main()
