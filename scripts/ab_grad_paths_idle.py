#!/usr/bin/env python3
"""Idle A/B: 'table' vs 'mfv' dispatch on the GRADIENT paths.

The round-5 contended A/B (scripts/probe_mfv_fused.py) claimed the mfv
fused kernel wins on the train param-grad step (1.45x) and the frozen
src-grad (1.34x). The first truly idle round-5 bench capture
(results/bench_idle_r5.json) shows the opposite vs the r4 idle capture
(which dispatched 'table'): train f32 32.7k -> 25.2k, bf16 36.1k ->
28.3k, frozen src-grad 11.0k -> 8.1k pairs/s. One of the two is chip-
sharing distortion. This script settles it: interleaved same-process
A/B of the exact bench.py computations with cfg.fused_gather pinned.

Writes one JSON line per measurement to stdout and (append) to
results/idle_r5/ab_grad_paths.jsonl.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig, TrainConfig
from dpdist_tpu.models import init_dpdist, apply_dpdist
from dpdist_tpu.models.dpdist import dpdist_distance
from dpdist_tpu.losses import l1_sample_loss
from dpdist_tpu.train.optim import make_optimizer
import optax

OUT = "results/idle_r5/ab_grad_paths.jsonl"
BATCH = 256


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def med_ms(fn, iters=20, reps=5):
    np.asarray(fn())  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        np.asarray(out)
        times.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(times))


def build(fused, dtype):
    cfg = DPDistConfig(fused_gather=fused, dtype=dtype)
    return cfg


def main():
    rng = np.random.default_rng(0)
    pcA = jnp.asarray(rng.uniform(-0.8, 0.8, (BATCH, 64, 3)).astype(np.float32))
    pcB = jnp.asarray(rng.uniform(-0.8, 0.8, (BATCH, 64, 3)).astype(np.float32))
    labels = jnp.asarray(
        np.abs(rng.uniform(0, 0.3, (BATCH, 64))).astype(np.float32))

    cfg0 = DPDistConfig()
    params, state = init_dpdist(jax.random.PRNGKey(0), cfg0)
    optimizer = make_optimizer(TrainConfig(batch_size=BATCH))

    # Build all timed callables up front, then interleave measurement so
    # any residual contention hits both arms equally.
    arms = {}
    for fused in ("table", "mfv"):
        for dtype in ("float32", "bfloat16"):
            cfg = build(fused, dtype)

            fwd = jax.jit(lambda p, s, a, b, cfg=cfg: apply_dpdist(
                p, s, cfg, a, b, train=False)[0])

            opt_state = optimizer.init(params)

            @jax.jit
            def train_step(p, s, o, a, b, lab, cfg=cfg):
                def loss_fn(pp, ss):
                    pred_AB, _, new_s = apply_dpdist(pp, ss, cfg, a, b,
                                                     train=True)
                    return l1_sample_loss(pred_AB, lab), new_s
                (loss, new_s), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, s)
                updates, new_o = optimizer.update(grads, o, p)
                return optax.apply_updates(p, updates), new_s, new_o, loss

            st = {"p": params, "s": state, "o": opt_state}

            def step_once(st=st, train_step=train_step):
                st["p"], st["s"], st["o"], loss = train_step(
                    st["p"], st["s"], st["o"], pcA, pcB, labels)
                return loss

            frozen_src = jax.jit(lambda p, s, a, b, cfg=cfg: jax.grad(
                lambda aa: dpdist_distance(p, s, cfg, aa, b))(a))

            key = (fused, dtype)
            arms[key] = {
                "fwd": lambda fwd=fwd: fwd(params, state, pcA, pcB),
                "train": step_once,
                "frozen_src": lambda f=frozen_src: f(params, state, pcA, pcB),
            }

    for name in ("fwd", "train", "frozen_src"):
        for key, fns in arms.items():
            fused, dtype = key
            ms = med_ms(fns[name])
            emit({"stage": name, "fused": fused, "dtype": dtype,
                  "ms_med": round(ms, 3), "B": BATCH,
                  "pairs_per_sec": round(BATCH / ms * 1e3, 1)})


if __name__ == "__main__":
    main()
