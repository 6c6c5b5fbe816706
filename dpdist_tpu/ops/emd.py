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
    """Geometric anneal for the first 2/3 of iterations, then hold at
    eps_end: the plan needs converged potentials AT the final temperature
    (measured: grad cosine vs the exact assignment rises 0.957 -> 0.977
    with held final-eps iterations, scripts/emd_grad_quality.py)."""
    n_anneal = max(iters * 2 // 3, 1)
    t = jnp.linspace(0.0, 1.0, n_anneal)
    anneal = eps_start * (eps_end / eps_start) ** t
    hold = jnp.full((iters - n_anneal,), eps_end)
    return jnp.concatenate([anneal, hold])


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


# ---------------------------------------------------------------------------
# Blocked Sinkhorn: O(N * tile) memory for large clouds
# ---------------------------------------------------------------------------

def _blocked_lse(x_pts, y_pts, pot_y, eps, tile: int):
    """For every x point: logsumexp over y of (pot_y - ||x-y||) / eps,
    streamed over y tiles with an online logsumexp (never materializes
    the N x M matrix)."""
    B, N, _ = x_pts.shape
    M = y_pts.shape[1]
    n_tiles = M // tile

    x2 = jnp.sum(x_pts * x_pts, -1)                        # (B, N)

    def body(carry, t):
        m_run, s_run = carry
        y_t = jax.lax.dynamic_slice_in_dim(y_pts, t * tile, tile, 1)
        p_t = jax.lax.dynamic_slice_in_dim(pot_y, t * tile, tile, 1)
        d2 = (x2[..., None] + jnp.sum(y_t * y_t, -1)[:, None, :]
              - 2.0 * jnp.einsum("bnd,bmd->bnm", x_pts, y_t,
                                 precision=jax.lax.Precision.HIGHEST))
        z = (p_t[:, None, :] - jnp.sqrt(jnp.maximum(d2, 1e-12))) / eps
        m_new = jnp.maximum(m_run, jnp.max(z, -1))
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(z - m_new[..., None]), -1)
        return (m_new, s_run), None

    m0 = jnp.full((B, N), -jnp.inf)
    s0 = jnp.zeros((B, N))
    (m, s), _ = jax.lax.scan(body, (m0, s0), jnp.arange(n_tiles))
    return m + jnp.log(s)


def _pad_to_tile(pts, tile):
    """Pad the point axis to a tile multiple with far-away sentinels that
    carry ~zero transport mass."""
    B, N, D = pts.shape
    Np = -(-N // tile) * tile
    if Np == N:
        return pts, N
    pad = jnp.full((B, Np - N, D), 1e4, pts.dtype)
    return jnp.concatenate([pts, pad], 1), N


def sinkhorn_emd_blocked(x, y, *, iters: int = 30, eps_start: float = 0.5,
                         eps_end: float = 0.01, tile: int = 1024):
    """Approximate EMD for clouds too large for the dense N x M plan.

    Memory is O(B * N * tile). The distance tiles are recomputed per
    Sinkhorn iteration (FLOPs scale with iters), which on TPU is the
    right trade: the dense plan at N = M = 10^5 would need 40 GB.
    Returns (B,) costs on the same scale as sinkhorn_emd. Not
    differentiable (eval/metric use; the dense sinkhorn_emd carries the
    custom VJP for training-scale clouds).
    """
    B, N0, _ = x.shape
    M0 = y.shape[1]
    x, _ = _pad_to_tile(x.astype(jnp.float32), tile)
    y, _ = _pad_to_tile(y.astype(jnp.float32), tile)
    N, M = x.shape[1], y.shape[1]
    # padded sentinel points still carry 1/N mass but sit 1e4 away from
    # everything, so their transport cost contribution is uniform and we
    # subtract it via masking in the final cost accumulation.
    log_a = -jnp.log(N0) * jnp.ones((B, N))
    log_b = -jnp.log(M0) * jnp.ones((B, M))
    mask_x = (jnp.arange(N) < N0)[None, :]
    mask_y = (jnp.arange(M) < M0)[None, :]
    log_a = jnp.where(mask_x, log_a, -1e30)
    log_b = jnp.where(mask_y, log_b, -1e30)

    schedule = _eps_schedule(iters, eps_start, eps_end)

    def body(carry, eps):
        f, g = carry
        f = eps * (log_a - _blocked_lse(x, y, g, eps, tile))
        g = eps * (log_b - _blocked_lse(y, x, f, eps, tile))
        return (f, g), None

    (f, g), _ = jax.lax.scan(body, (jnp.zeros((B, N)), jnp.zeros((B, M))),
                             schedule)
    eps_last = schedule[-1]

    # cost = sum_nm P_nm d_nm, streamed the same way: accumulate per x row
    # E_n = sum_m exp((f_n + g_m - d)/eps) * d, then cost = sum_n E_n / mass.
    def cost_tiles(carry, t):
        num, den = carry
        y_t = jax.lax.dynamic_slice_in_dim(y, t * tile, tile, 1)
        g_t = jax.lax.dynamic_slice_in_dim(g, t * tile, tile, 1)
        d2 = (jnp.sum(x * x, -1)[..., None]
              + jnp.sum(y_t * y_t, -1)[:, None, :]
              - 2.0 * jnp.einsum("bnd,bmd->bnm", x, y_t,
                                 precision=jax.lax.Precision.HIGHEST))
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        logP = (f[..., None] + g_t[:, None, :] - d) / eps_last
        P = jnp.exp(jnp.minimum(logP, 30.0))
        num = num + jnp.sum(P * d, (1, 2))
        den = den + jnp.sum(P, (1, 2))
        return (num, den), None

    (num, den), _ = jax.lax.scan(cost_tiles,
                                 (jnp.zeros(B), jnp.zeros(B)),
                                 jnp.arange(M // tile))
    return num / jnp.maximum(den, 1e-12)


def earth_mover_distance(pc1, pc2, *, iters: int = 50):
    """Scalar EMD loss: mean over batch of (matched cost / num_points)...

    matching tf_util_loss.earth_mover (tf_util_loss.py:42-47), where
    match_cost sums distance * mass and mass totals num_points. With our
    unit-mass plan, cost already equals (CUDA cost / num_points).
    """
    assert pc1.shape[1] == pc2.shape[1]
    return jnp.mean(sinkhorn_emd(pc1, pc2, iters))
