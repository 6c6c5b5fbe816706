"""Registration data: templates + random poses.

Reference: pcrnet-registration/helper.py (templates h5 IO :46-136, pose
generators :274-291), utils/create_dataset/generate_poses_ours.py (±45°
rotation, ±0.01 translation, 5070 poses) and the training-time source
synthesis in iterative_PCRNet_ours.py:380-408 (apply pose -> centroid
subtract -> optional random-point selection / noise / occlusions).

Templates come from an h5 file ('templates' dataset, B x N x 3) when
available, else from the synthetic surface family.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from dpdist_tpu.data import augment  # noqa: F401  (kept for parity users)
from dpdist_tpu.data.synthetic import synthetic_surface


def generate_poses(num_poses: int, *, max_rotate_deg: float = 45.0,
                   t_clip: float = 0.01, gaussian: bool = False,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """(num_poses, 6) poses: translation + euler radians.

    Matches generate_poses_ours.py:4-21 (uniform in ±t_clip / ±max_deg).
    """
    rng = rng or np.random.default_rng(0)
    if gaussian:
        t = rng.standard_normal((num_poses, 3)) * t_clip / 3.0
        d = rng.standard_normal((num_poses, 3)) * max_rotate_deg / 3.0 * np.pi / 180
    else:
        t = rng.uniform(-t_clip, t_clip, (num_poses, 3))
        d = rng.uniform(-max_rotate_deg, max_rotate_deg, (num_poses, 3)) * np.pi / 180
    return np.concatenate([t, d], 1).astype(np.float32)


def default_eval_poses() -> str:
    """Path of the committed 5,070-pose eval CSV (±45° / ±0.01, seed 2020)
    — the repo's equivalent of the reference's checked-in
    itr_net_test_data45_1.csv (generate_poses_ours.py layout). Evaluating
    a fixed pose set makes results comparable across methods and rounds."""
    import os

    return os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "assets", "eval_poses_45deg_5070.csv")


def apply_pose6_np(points: np.ndarray, pose6: np.ndarray) -> np.ndarray:
    """Batched numpy twin of geometry.apply_pose6 (Rz then Ry then Rx + t),
    bit-matching helper.apply_transformation (helper.py:229-258)."""
    out = np.empty_like(points, dtype=np.float32)
    for i in range(points.shape[0]):
        rx, ry, rz = pose6[i, 3], pose6[i, 4], pose6[i, 5]
        Rx = np.array([[1, 0, 0], [0, np.cos(rx), -np.sin(rx)], [0, np.sin(rx), np.cos(rx)]])
        Ry = np.array([[np.cos(ry), 0, np.sin(ry)], [0, 1, 0], [-np.sin(ry), 0, np.cos(ry)]])
        Rz = np.array([[np.cos(rz), -np.sin(rz), 0], [np.sin(rz), np.cos(rz), 0], [0, 0, 1]])
        out[i] = (Rx @ Ry @ Rz @ points[i].T).T + pose6[i, :3]
    return out


def add_noise_np(source: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Per-point gaussian noise with random per-point sigma in [0, 0.04)
    (helper.add_noise, helper.py:464-470)."""
    out = source.copy()
    for i in range(out.shape[0]):
        sigma = 0.04 * rng.uniform(size=(out.shape[1], 1))
        out[i] += sigma * rng.standard_normal(out[i].shape)
    return out.astype(np.float32)


def add_occlusions_np(source: np.ndarray, fraction: float,
                      rng: np.random.Generator) -> np.ndarray:
    """Remove a kNN ball around a random point, refill by resampling kept
    points (helper.add_occlusions, helper.py:963-982 semantics: the cloud
    keeps its size)."""
    B, N, _ = source.shape
    if not 0.0 <= fraction < 1.0:
        raise ValueError(
            f"occlusion fraction must be in [0, 1), got {fraction}")
    n_drop = int(N * fraction)
    if n_drop == 0:
        return source
    out = np.empty_like(source)
    for i in range(B):
        c = source[i, rng.integers(N)]
        d = np.linalg.norm(source[i] - c, axis=1)
        keep = np.argsort(d)[n_drop:]
        refill = rng.choice(keep, size=N, replace=True)
        refill[: len(keep)] = keep
        out[i] = source[i, refill]
    return out


class PerturbedRegistrationDataset:
    """Wrap a RegistrationDataset adding per-point noise / occlusion to
    the source after pose synthesis (the evaluator's --use_noise_data /
    --add_occlusions paths, results_itrPCRNet_no_stop.py:250-313)."""

    def __init__(self, base, *, noise: bool = False,
                 occlusion_fraction: float = 0.0):
        self.base = base
        self.noise = noise
        self.occlusion_fraction = occlusion_fraction

    def sample_batch(self, batch_size, **kw):
        out = self.base.sample_batch(batch_size, **kw)
        t, s, gt = out[:3]
        if self.noise:
            s = add_noise_np(s, self.base.rng)
        if self.occlusion_fraction > 0:
            s = add_occlusions_np(s, self.occlusion_fraction, self.base.rng)
        return (t, s, gt) + tuple(out[3:])


class RegistrationDataset:
    """Template library + pose sampler producing (template, source, gt_pose)."""

    def __init__(self, *, templates: Optional[np.ndarray] = None,
                 h5_path: Optional[str] = None,
                 families: Sequence[str] = ("chair",),
                 n_templates: int = 16, num_point: int = 1024,
                 max_rotate_deg: float = 45.0, t_clip: float = 0.01,
                 scale: float = 0.8, seed: int = 0,
                 sparse: int = 0, s_rand_points: float = 0.0,
                 centroid_sub: bool = True,
                 poses: Optional[np.ndarray] = None,
                 pose_file: Optional[str] = None):
        """scale: synthetic templates are scaled like the reference's
        registration data, which is built from the *_dist_c_scaled (x0.8)
        surfaces — also what a frozen DPDist loss was trained on.

        poses / pose_file: FIXED-POSE protocol parity — the reference
        evaluates a committed CSV of poses so runs are comparable across
        methods and time (generate_poses_ours.py:4-21; consumed at
        results_itrPCRNet_no_stop.py:250-309 with case fn pairing
        template fn % n_templates with pose fn). When set, sample_batch
        consumes poses SEQUENTIALLY and cycles templates in order instead
        of sampling either randomly. The packaged default lives at
        dpdist_tpu/assets/eval_poses_45deg_5070.csv (default_eval_poses).

        sparse / s_rand_points / centroid_sub reproduce the reference's
        CANONICAL experiment matrix (run_train_and_eval_PCRNet.bash:17-31:
        SPARSE=1, SAMPLES=1.0, centroid_sub=0): with probability
        s_rand_points the template and source are drawn as DISJOINT random
        N-point subsets of the same surface (helper.split_template_source,
        helper.py:925-961) — different samplings of one surface, the
        regime the DPDist paper targets. sparse=1 pools the first 2N
        points, sparse=2 the first 4N. centroid_sub=False skips the
        source centroid subtraction (the bash default)."""
        self.rng = np.random.default_rng(seed)
        self.num_point = num_point
        self.max_rotate_deg = max_rotate_deg
        self.t_clip = t_clip
        self.sparse = int(sparse)
        self.s_rand_points = float(s_rand_points)
        self.centroid_sub = bool(centroid_sub)
        if pose_file is not None:
            from dpdist_tpu.data.io import read_pose_csv

            poses = read_pose_csv(pose_file)
        self.poses = None if poses is None else np.asarray(poses, np.float32)
        self._pose_cursor = 0
        # Per-template family label (per-family eval reporting; the
        # reference's report machinery slices stats per run config,
        # helper.py:795-911 — here the slicing key is the shape family).
        self.template_families: Optional[list] = None
        if templates is not None:
            self.templates = templates.astype(np.float32)
        elif h5_path is not None:
            import h5py

            with h5py.File(h5_path, "r") as f:
                self.templates = np.asarray(f["templates"]).astype(np.float32)
        else:
            self.templates = np.stack([
                synthetic_surface(families[i % len(families)], seed=seed + i,
                                  n_points=max(num_point, 2048))
                for i in range(n_templates)
            ]) * scale
            self.template_families = [families[i % len(families)]
                                      for i in range(n_templates)]
        assert self.templates.shape[1] >= num_point
        if self.sparse > 0 and self.templates.shape[1] < 2 * self.sparse * num_point:
            # the disjoint split pools the first 2*sparse*N points
            # (helper.py:928-932); a smaller template would silently
            # produce an undersized source cloud.
            raise ValueError(
                f"sparse={self.sparse} needs templates with >= "
                f"{2 * self.sparse * num_point} points, got "
                f"{self.templates.shape[1]}")

    def _sample_sparse(self, template: np.ndarray, pose6: np.ndarray):
        """helper.split_template_source (helper.py:925-961), SPARSE>=1:
        pool the first 2*sparse*N points, one shared shuffle, template =
        first N and source = next N (disjoint), THEN pose the source."""
        N = self.num_point
        pool = template[:, : 2 * self.sparse * N]
        perm = self.rng.permutation(pool.shape[1])[: 2 * N]
        template_n = pool[:, perm[:N]]
        source_n = apply_pose6_np(np.ascontiguousarray(pool[:, perm[N:]]),
                                  pose6)
        return template_n, source_n

    def sample_batch(self, batch_size: int, *,
                     random_points_prob: Optional[float] = None,
                     noise_prob: float = 0.0, occlusion_fraction: float = 0.0,
                     return_info: bool = False):
        """Training-batch synthesis (iterative_PCRNet_ours.py:380-408).

        random_points_prob defaults to the dataset's s_rand_points so
        protocol-level sampling (e.g. the canonical sparse split) applies
        to callers that don't pass per-batch options (the evaluator).

        return_info=True appends an info dict (template indices + family
        labels) for per-family evaluation reporting."""
        if random_points_prob is None:
            random_points_prob = self.s_rand_points
        if self.poses is not None:
            # Fixed-pose protocol: sequential poses, templates cycled in
            # order (results_itrPCRNet_no_stop.py:240-267 semantics).
            take = np.arange(self._pose_cursor, self._pose_cursor + batch_size)
            self._pose_cursor += batch_size
            idx = take % len(self.templates)
            pose6 = self.poses[take % len(self.poses)].copy()
        else:
            idx = self.rng.integers(0, len(self.templates), batch_size)
            pose6 = generate_poses(batch_size,
                                   max_rotate_deg=self.max_rotate_deg,
                                   t_clip=self.t_clip, rng=self.rng)
        template = self.templates[idx]
        info = None
        if return_info:
            fams = (None if self.template_families is None
                    else [self.template_families[i] for i in idx])
            info = {"template_idx": np.asarray(idx), "family": fams}

        def _ret(t, s, p):
            return (t, s, p, info) if return_info else (t, s, p)

        if self.sparse > 0:
            if self.rng.uniform() < random_points_prob:
                template_n, source_n = self._sample_sparse(template, pose6)
            else:
                # the reference's else-branch: template and source are the
                # SAME first-N points, pose applied to the source
                # (helper.split_template_source, helper.py:936-938) — not
                # a re-rolled random subset.
                template_n = template[:, : self.num_point]
                source_n = apply_pose6_np(template_n, pose6)
            if self.centroid_sub:
                c = source_n.mean(1, keepdims=True)
                source_n = source_n - c
                pose6 = pose6.copy()
                pose6[:, :3] -= c[:, 0, :]
            if self.rng.uniform() < noise_prob:
                source_n = add_noise_np(source_n, self.rng)
            if occlusion_fraction > 0:
                source_n = add_occlusions_np(source_n, occlusion_fraction,
                                             self.rng)
            return _ret(template_n.astype(np.float32),
                        source_n.astype(np.float32), pose6)

        source = apply_pose6_np(template, pose6)
        # Centroid subtraction (iterative_PCRNet_ours.py:385; the evaluator
        # corrects the GT translation by the recorded centroid,
        # results_itrPCRNet_no_stop.py:300-309). Translation is applied
        # last in pose6, so folding the shift into gt is exact. The
        # reference's canonical bash runs centroid_sub=0.
        if self.centroid_sub:
            c = source.mean(1, keepdims=True)
            source = source - c
            pose6 = pose6.copy()
            pose6[:, :3] -= c[:, 0, :]

        N = self.num_point
        if self.rng.uniform() < random_points_prob:
            pt = self.rng.permutation(template.shape[1])[:N]
            ps = self.rng.permutation(source.shape[1])[:N]
            template_n, source_n = template[:, pt], source[:, ps]
        else:
            template_n, source_n = template[:, :N], source[:, :N]
        if self.rng.uniform() < noise_prob:
            source_n = add_noise_np(source_n, self.rng)
        if occlusion_fraction > 0:
            source_n = add_occlusions_np(source_n, occlusion_fraction, self.rng)
        return _ret(template_n.astype(np.float32),
                    source_n.astype(np.float32), pose6)
