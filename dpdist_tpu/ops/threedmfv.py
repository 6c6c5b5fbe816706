"""3D modified Fisher Vector (3DmFV) encoder — TPU-native formulation.

Reference math: get_3dmfv_tf (utils/dpdist_util.py:22-141). The reference
materializes B x N x G x 3 broadcast tensors and evaluates
tf.contrib.distributions.MultivariateNormalDiag per (point, Gaussian) pair.

TPU-first redesign:
  * Gaussian responsibilities Q only ever depend on relative likelihoods,
    and for a uniform-weight isotropic GMM on a grid they reduce to a
    softmax over -||x - mu_g||^2 / (2 sigma^2). We compute the squared
    distances with the matmul identity ||x||^2 + ||mu||^2 - 2 x.mu_g^T,
    which puts the O(N*G*D) work on the MXU, and take a numerically-stable
    softmax. This is exactly equal to the reference's Q (the (2 pi)^{-D/2}
    sigma^{-D} and 1/K factors cancel in the normalization).
  * The derivative tensors are reduced over the point axis with
    mean/max/min as in the reference; XLA fuses the elementwise ops into
    the reductions, so nothing of size B x N x G x D needs to round-trip
    through HBM.

Channel layout of the unflattened output (B, G, 20) with full_fv=True:
  [ d_pi_mean, d_pi_max,
    d_mu_mean(3), d_mu_max(3), d_mu_min(3),
    d_sig_mean(3), d_sig_max(3), d_sig_min(3) ]
matching the reference's concat order (dpdist_util.py:83,94,106,134).

The flattened variant (B, 20*G) matches the reference's channel-major
flatten (transpose to B x C x G then flatten; dpdist_util.py:127-132).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def threedmfv_grid(n_gaussians: int, dims: int = 3) -> np.ndarray:
    """Gaussian centers on the uniform grid, in the reference's flat order.

    l = linspace(-1, 1, g, endpoint=False) + 1/g;  mu built via
    np.meshgrid(l, l, l) then stacking the flattened X, Y, Z coordinates
    (dpdist_util.py:42-48). With meshgrid's default 'xy' indexing the flat
    index v = iy*g^2 + ix*g + iz carries center (l[ix], l[iy], l[iz]).
    """
    if dims == 2:
        g = int(np.sqrt(n_gaussians))
        l = np.linspace(-1, 1, g, False) + 1.0 / g
        x, y = np.meshgrid(l, l)
        return np.stack([x.flatten(), y.flatten()], -1).astype(np.float32)
    g = int(np.ceil(n_gaussians ** (1.0 / 3.0)))
    l = np.linspace(-1, 1, g, False) + 1.0 / g
    x, y, z = np.meshgrid(l, l, l)
    return np.stack([x.flatten(), y.flatten(), z.flatten()], -1).astype(np.float32)


def _l2_normalize_over_gaussians(x, eps: float = 1e-12):
    """tf.nn.l2_normalize(x, dim=1): normalize each (b, :, c) vector."""
    sq = jnp.sum(x * x, axis=1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def _power_normalize(x, alpha: float = 0.5, eps: float = 1e-12):
    """sign(x) * max(|x|, eps)^alpha (dpdist_util.py:118-121)."""
    return jnp.sign(x) * jnp.power(jnp.maximum(jnp.abs(x), eps), alpha)


def _on_tpu() -> bool:
    try:
        return any("tpu" in str(d).lower() for d in jax.devices())
    except Exception:
        return False


def threedmfv(points, n_gaussians: int = 512, sigma: float = 0.125,
              *, flatten: bool = False, normalize: bool = True,
              full_fv: bool = True, impl: str = "auto"):
    """Compute the 3DmFV representation of a batch of point clouds.

    Args:
      points: (B, N, D) point clouds, D in {2, 3}.
      n_gaussians: G, a perfect square (2D) or cube (3D).
      sigma: isotropic Gaussian stddev.
      flatten: if True return (B, C*G) channel-major; else (B, G, C).
      full_fv: include max/min pooled derivatives (C=20) or mean only (C=7).
      impl: "auto" | "xla" | "pallas". auto picks the fused Pallas kernel
        on TPU for large point counts (where streaming beats XLA fusion);
        the XLA path wins for small N (per-program overhead dominates).

    Returns:
      (B, G, C) float32 Fisher vectors (or flattened variant).
    """
    B, N, D = points.shape
    # auto: idle-chip A/B on v5e (full forward, B=256): at N=64 XLA edges
    # the batch-tiled kernel by ~2% (25.4k vs 24.9k pairs/s); at N=256 the
    # kernel wins ~9% (14.9k vs 13.7k) and the gap grows with N (the
    # streaming accumulator avoids the (B, N, G, D) HBM tensors). Cross
    # over at N >= 128. XLA remains the non-TPU path and the path for
    # exotic configs (2-D, partial FV, unnormalized).
    # DPDIST_THREEDMFV_IMPL overrides 'auto' (profiling A/B knob).
    import os

    impl = os.environ.get("DPDIST_THREEDMFV_IMPL", impl) if impl == "auto" else impl
    kernel_ok = D == 3 and full_fv and normalize
    if impl == "pallas" and not kernel_ok:
        # The fused kernel only implements the canonical full-FV normalized
        # 3-D config; forcing it onto anything else would silently return
        # the wrong representation.
        raise ValueError(
            "impl='pallas' requires D==3, full_fv=True, normalize=True "
            f"(got D={D}, full_fv={full_fv}, normalize={normalize})")
    use_pallas = impl == "pallas" or (
        impl == "auto" and kernel_ok and N >= 128 and _on_tpu()
    )
    if use_pallas:
        from dpdist_tpu.kernels.threedmfv_pallas import threedmfv_pallas

        # interpret off-TPU so a forced impl='pallas' still runs (slowly)
        # on CPU instead of erroring inside Mosaic.
        fv = threedmfv_pallas(points, n_gaussians, sigma,
                              interpret=not _on_tpu())
        if flatten:
            return jnp.transpose(fv, (0, 2, 1)).reshape(B, -1)
        return fv
    mu = jnp.asarray(threedmfv_grid(n_gaussians, D))  # (G, D)
    G = mu.shape[0]
    w = 1.0 / G

    pts = points.astype(jnp.float32)
    # Squared distances via matmul: (B, N, G)
    x2 = jnp.sum(pts * pts, axis=-1, keepdims=True)          # (B, N, 1)
    mu2 = jnp.sum(mu * mu, axis=-1)[None, None, :]           # (1, 1, G)
    xmu = jnp.einsum("bnd,gd->bng", pts, mu,
                     precision=jax.lax.Precision.HIGHEST)
    d2 = x2 + mu2 - 2.0 * xmu
    # Responsibilities: softmax over Gaussians of -d2/(2 sigma^2).
    logits = -d2 / (2.0 * sigma * sigma)
    Q = jax.nn.softmax(logits, axis=-1)                      # (B, N, G)

    # Derivative tensors; diff has shape (B, N, G, D).
    diff = (pts[:, :, None, :] - mu[None, None, :, :]) / sigma
    Qd = Q[..., None]

    d_pi_all = (Q - w) / (np.sqrt(w) * N)                    # (B, N, G)
    d_mu_all = Qd * diff                                     # (B, N, G, D)
    d_sig_all = Qd * (diff * diff - 1.0)                     # (B, N, G, D)

    # Pool over the point axis.
    d_pi_mean = jnp.mean(d_pi_all, axis=1)[..., None]        # (B, G, 1)
    if full_fv:
        d_pi_max = jnp.max(d_pi_all, axis=1)[..., None]
        d_pi = jnp.concatenate([d_pi_mean, d_pi_max], axis=2)
    else:
        d_pi = d_pi_mean

    d_mu_mean = jnp.mean(d_mu_all, axis=1)
    if full_fv:
        d_mu_max = jnp.max(d_mu_all, axis=1)
        d_mu_min = jnp.min(d_mu_all, axis=1)
        d_mu = jnp.concatenate([d_mu_mean, d_mu_max, d_mu_min], axis=2)
    else:
        d_mu = d_mu_mean
    d_mu = d_mu / np.sqrt(w)

    d_sig_mean = jnp.mean(d_sig_all, axis=1)
    if full_fv:
        d_sig_max = jnp.max(d_sig_all, axis=1)
        d_sig_min = jnp.min(d_sig_all, axis=1)
        d_sig = jnp.concatenate([d_sig_mean, d_sig_max, d_sig_min], axis=2)
    else:
        d_sig = d_sig_mean
    d_sig = d_sig / np.sqrt(2.0 * w)

    if normalize:
        d_pi = _l2_normalize_over_gaussians(_power_normalize(d_pi))
        d_mu = _l2_normalize_over_gaussians(_power_normalize(d_mu))
        d_sig = _l2_normalize_over_gaussians(_power_normalize(d_sig))

    if flatten:
        # Channel-major flatten: transpose (B, G, C)->(B, C, G) then reshape
        # (dpdist_util.py:129-132).
        def flat(x):
            return jnp.transpose(x, (0, 2, 1)).reshape(B, -1)

        return jnp.concatenate([flat(d_pi), flat(d_mu), flat(d_sig)], axis=1)

    # Unflattened: concat channels; the reference's double transpose is a
    # no-op, so this is directly (B, G, C) (dpdist_util.py:134-137).
    return jnp.concatenate([d_pi, d_mu, d_sig], axis=2)
