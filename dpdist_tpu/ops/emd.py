"""Approximate Earth Mover's Distance — entropic (Sinkhorn) formulation.

TPU-native replacement for the reference's external CUDA ops
tf_approxmatch.approx_match / match_cost (tf_util_loss.py:42-47), which
implement an auction-style soft matching with a data-dependent loop —
hostile to XLA. Here we use fixed-iteration Sinkhorn scaling in log space:

  * static iteration count -> compiles to one fused lax.scan on TPU;
  * a temperature schedule (epsilon annealing) recovers near-exact
    matchings like the reference's progressive auction rounds;
  * gradients flow through the *transport plan fixed* (envelope theorem)
    via a custom VJP: d EMD / d x = sum_m P[n,m] * d||x_n - y_m|| / d x_n.
    This matches the CUDA match_cost gradient semantics (the plan is
    treated as a constant in the backward pass) and avoids backprop
    through the scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sinkhorn_plan(cost, iters: int, eps_schedule):
    """Log-domain Sinkhorn with uniform marginals.

    cost: (B, N, M). Returns transport plan P (B, N, M) with rows summing
    to 1/N and columns to 1/M (approximately).
    """
    B, N, M = cost.shape
    log_a = -jnp.log(N) * jnp.ones((B, N))
    log_b = -jnp.log(M) * jnp.ones((B, M))

    def body(carry, eps):
        f, g = carry
        # f update: f_n = eps * (log_a_n - logsumexp_m((g_m - C_nm)/eps))
        f = eps * (log_a - jax.nn.logsumexp((g[:, None, :] - cost) / eps, axis=2))
        g = eps * (log_b - jax.nn.logsumexp((f[:, :, None] - cost) / eps, axis=1))
        return (f, g), None

    f0 = jnp.zeros((B, N))
    g0 = jnp.zeros((B, M))
    (f, g), _ = jax.lax.scan(body, (f0, g0), eps_schedule)
    eps_last = eps_schedule[-1]
    logP = (f[:, :, None] + g[:, None, :] - cost) / eps_last
    return jnp.exp(logP)


def _eps_schedule(iters: int, eps_start: float, eps_end: float):
    t = jnp.linspace(0.0, 1.0, iters)
    return eps_start * (eps_end / eps_start) ** t


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sinkhorn_emd(x, y, iters: int = 50, eps_start: float = 0.5,
                 eps_end: float = 0.002):
    """Per-batch approximate EMD: sum over matched pairs of euclidean cost.

    Returns (B,) costs, scaled like the CUDA op's match_cost: total
    transported euclidean distance with unit total mass (so divide by 1 —
    the reference then divides by num_points; see earth_mover_distance).
    """
    cost, P = _emd_fwd_core(x, y, iters, eps_start, eps_end)
    return cost


def _emd_fwd_core(x, y, iters, eps_start, eps_end):
    d2 = (
        jnp.sum(x * x, -1)[:, :, None]
        + jnp.sum(y * y, -1)[:, None, :]
        - 2.0 * jnp.einsum("bnd,bmd->bnm", x, y,
                           precision=jax.lax.Precision.HIGHEST)
    )
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    P = _sinkhorn_plan(d, iters, _eps_schedule(iters, eps_start, eps_end))
    # Normalize the plan mass to exactly 1 per batch to remove Sinkhorn
    # truncation error from the cost scale.
    P = P / jnp.maximum(jnp.sum(P, axis=(1, 2), keepdims=True), 1e-12)
    cost = jnp.sum(P * d, axis=(1, 2))
    return cost, (x, y, P)


def _emd_vjp_fwd(x, y, iters, eps_start, eps_end):
    cost, res = _emd_fwd_core(x, y, iters, eps_start, eps_end)
    return cost, res


def _emd_vjp_bwd(iters, eps_start, eps_end, res, g):
    x, y, P = res
    # Envelope theorem: hold P fixed; d cost / d x_n = sum_m P_nm u_nm,
    # u = (x_n - y_m)/||x_n - y_m||.
    diff = x[:, :, None, :] - y[:, None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-12))
    u = diff / dist[..., None]
    gx = g[:, None, None] * jnp.sum(P[..., None] * u, axis=2)
    gy = -g[:, None, None] * jnp.sum(P[..., None] * u, axis=1)
    return gx, gy


sinkhorn_emd.defvjp(_emd_vjp_fwd, _emd_vjp_bwd)


def earth_mover_distance(pc1, pc2, *, iters: int = 50):
    """Scalar EMD loss: mean over batch of (matched cost / num_points)...

    matching tf_util_loss.earth_mover (tf_util_loss.py:42-47), where
    match_cost sums distance * mass and mass totals num_points. With our
    unit-mass plan, cost already equals (CUDA cost / num_points).
    """
    assert pc1.shape[1] == pc2.shape[1]
    return jnp.mean(sinkhorn_emd(pc1, pc2, iters))
