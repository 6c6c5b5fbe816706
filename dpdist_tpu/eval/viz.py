"""Matplotlib visualization (reference observability parity, SURVEY §5).

The reference saves point-cloud reconstruction snapshots during AUE
training (train_multi_gpu_pc_compare_dist.py:574-590) and per-iteration
registration error plots (results_itrPCRNet_no_stop.py:433-462). All
functions are no-ops returning None when matplotlib is unavailable and
always use the Agg backend (headless).
"""

from __future__ import annotations

from typing import Optional, Sequence


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def save_cloud_pair(path: str, cloud_a, cloud_b, *, titles=("rec", "input"),
                    lim: float = 1.0) -> Optional[str]:
    """Side-by-side 3D scatter snapshot (reference :574-590)."""
    plt = _plt()
    if plt is None:
        return None
    fig = plt.figure(figsize=(8, 4))
    for i, (pc, title) in enumerate(zip((cloud_a, cloud_b), titles)):
        ax = fig.add_subplot(1, 2, i + 1, projection="3d")
        ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=2)
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(-lim, lim)
        ax.set_title(title)
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path


def save_iteration_curves(path: str, rot_err: Sequence[float],
                          trans_err: Sequence[float],
                          conv_err: Optional[Sequence[float]] = None
                          ) -> Optional[str]:
    """Per-iteration registration error curves (plot_iter_graph parity)."""
    plt = _plt()
    if plt is None:
        return None
    fig, axes = plt.subplots(1, 3 if conv_err is not None else 2,
                             figsize=(12, 3.5))
    axes[0].plot(rot_err)
    axes[0].set_title("rotation error (deg)")
    axes[1].plot(trans_err)
    axes[1].set_title("translation error")
    if conv_err is not None:
        axes[2].semilogy(conv_err)
        axes[2].set_title("convergence measure")
    for ax in axes:
        ax.set_xlabel("iteration")
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path


def save_error_histograms(path: str, rot_err_deg, trans_err) -> Optional[str]:
    """Rotation/translation error histograms (helper.log_test_results
    parity, helper.py:771-923)."""
    plt = _plt()
    if plt is None:
        return None
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
    axes[0].hist(rot_err_deg, bins=36)
    axes[0].set_xlabel("rotation error (deg)")
    axes[1].hist(trans_err, bins=36)
    axes[1].set_xlabel("translation error")
    for ax in axes:
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path


def point_cloud_three_views(points, *, img_size: int = 128,
                            radius: float = 1.0):
    """Render axis-aligned XY/XZ/YZ density projections as one image array.

    Lightweight stand-in for pc_util.point_cloud_three_views
    (utils/pc_util.py:24-198): returns (img_size, 3*img_size) float array
    in [0, 1], no matplotlib required.
    """
    import numpy as np

    pts = np.asarray(points)
    views = []
    for axes in ((0, 1), (0, 2), (1, 2)):
        img = np.zeros((img_size, img_size), np.float32)
        u = ((pts[:, axes[0]] + radius) / (2 * radius) * (img_size - 1))
        v = ((pts[:, axes[1]] + radius) / (2 * radius) * (img_size - 1))
        ok = (u >= 0) & (u < img_size) & (v >= 0) & (v < img_size)
        np.add.at(img, (v[ok].astype(int), u[ok].astype(int)), 1.0)
        m = img.max()
        views.append(img / m if m > 0 else img)
    import numpy as _np

    return _np.concatenate(views, axis=1)


def save_three_views(path: str, points) -> Optional[str]:
    plt = _plt()
    if plt is None:
        return None
    img = point_cloud_three_views(points)
    fig, ax = plt.subplots(figsize=(9, 3))
    ax.imshow(img, cmap="gray_r", origin="lower")
    ax.axis("off")
    fig.savefig(path, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return path


def save_loss_curve(path: str, losses: Sequence[float], *,
                    ylabel: str = "loss") -> Optional[str]:
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.plot(losses)
    ax.set_xlabel("epoch")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path
