"""Literal numpy re-executions of the reference TF graph semantics.

These follow the reference code line by line (tensor layouts, reduction
axes, normalization order) so the JAX ops can be golden-tested against the
exact math the TF1 implementation computes. No TF required.
"""

import numpy as np


def threedmfv_oracle(points, n_gaussians, sigma, flatten=False, full_fv=True):
    """Literal re-execution of get_3dmfv_tf (utils/dpdist_util.py:22-141)."""
    B, N, D = points.shape
    g = int(np.ceil(n_gaussians ** (1 / 3))) if D == 3 else int(np.sqrt(n_gaussians))
    l = np.linspace(-1, 1, g, False) + (1 / g)
    if D == 2:
        x, y = np.meshgrid(l, l)
        mu = np.stack([x.flatten(), y.flatten()]).T
    else:
        x, y, z = np.meshgrid(l, l, l)
        mu = np.stack([x.flatten(), y.flatten(), z.flatten()]).T
    G = mu.shape[0]
    # follow the input dtype (TF1 runs the graph in float32; without this
    # numpy's f64 linspace promotes the whole oracle to float64)
    mu = mu.astype(points.dtype)
    w = (np.ones(G) / G).astype(points.dtype)
    sigma = points.dtype.type(sigma)

    # p_per_point: MultivariateNormalDiag prob, batch tiled
    diff = points[:, :, None, :] - mu[None, None, :, :]       # B,N,G,D
    d2 = np.sum(diff ** 2, -1)
    p = (2 * np.pi) ** (-D / 2) * sigma ** (-D) * np.exp(-d2 / (2 * sigma ** 2))
    w_p = p * w[None, None, :]
    Q = w_p / np.sum(w_p, -1, keepdims=True)
    Q_per_d = Q[..., None]

    d_pi_all = ((Q - w) / (np.sqrt(w) * N))[..., None]         # B,N,G,1
    d_pi_mean = d_pi_all.mean(1)
    d_pi_max = d_pi_all.max(1)
    d_pi = np.concatenate([d_pi_mean, d_pi_max], 2) if full_fv else d_pi_mean

    d_mu_all = Q_per_d * diff / sigma
    parts = [d_mu_all.mean(1)]
    if full_fv:
        parts += [d_mu_all.max(1), d_mu_all.min(1)]
    d_mu = np.concatenate(parts, 2) / np.sqrt(w)[None, :, None]

    d_sig_all = Q_per_d * ((diff / sigma) ** 2 - 1)
    parts = [d_sig_all.mean(1)]
    if full_fv:
        parts += [d_sig_all.max(1), d_sig_all.min(1)]
    d_sig = np.concatenate(parts, 2) / np.sqrt(2 * w)[None, :, None]

    # power + L2 normalize over the Gaussian axis
    def norm(x):
        eps = 1e-12
        x = np.sign(x) * np.maximum(np.abs(x), eps) ** 0.5
        n2 = np.sqrt(np.maximum(np.sum(x ** 2, axis=1, keepdims=True), 1e-12))
        return x / n2

    d_pi, d_mu, d_sig = norm(d_pi), norm(d_mu), norm(d_sig)

    if flatten:
        def flat(x):
            return np.transpose(x, (0, 2, 1)).reshape(B, -1)
        return np.concatenate([flat(d_pi), flat(d_mu), flat(d_sig)], 1)
    return np.concatenate([d_pi, d_mu, d_sig], 2)


def grid_binary_mask_oracle(centers, point_cloud):
    """Literal get_pc_grid_binary_mask_from_centers (dpdist_util.py:459-492)."""
    B, N, D = point_cloud.shape
    V = centers.shape[0]
    if D == 2:
        h = abs(centers[0][0] - centers[1][0]) / 2
    else:
        h = abs(centers[0][2] - centers[1][2]) / 2
    C = np.broadcast_to(centers[None, None], (B, N, V, D))
    P = np.broadcast_to(point_cloud[:, :, None, :], (B, N, V, D))
    bv = np.ones((B, N, V))
    for d in range(D):
        bv = bv * (P[..., d] > C[..., d] - h) * (P[..., d] <= C[..., d] + h)
    argmax = np.argmax(bv, 2)
    rel = P - C
    return bv, rel, argmax


def extract_volume_patches_oracle(vol, k):
    """tf.extract_volume_patches(SAME, stride 1) for (B,g,g,g,C)."""
    B, g, _, _, C = vol.shape
    kh = k // 2
    padded = np.pad(vol, ((0, 0), (kh, kh), (kh, kh), (kh, kh), (0, 0)))
    out = np.zeros((B, g, g, g, k * k * k * C), vol.dtype)
    for i in range(g):
        for j in range(g):
            for l in range(g):
                patch = padded[:, i:i + k, j:j + k, l:l + k, :]
                out[:, i, j, l, :] = patch.reshape(B, -1)
    return out
