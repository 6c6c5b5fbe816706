import numpy as np
import pytest

from dpdist_tpu.data.synthetic import synthetic_surface, SHAPE_FAMILIES
from dpdist_tpu.data.gtgen import (
    generate_gt_for_points,
    generate_synthetic_dataset,
    min_distances,
)
from dpdist_tpu.data.modelnet import SurfacePairDataset
from dpdist_tpu.data.batching import assemble_dpdist_batch
from dpdist_tpu.data import augment


def test_synthetic_surfaces_unit_scale():
    for fam in SHAPE_FAMILIES:
        pts = synthetic_surface(fam, seed=0, n_points=512)
        assert pts.shape == (512, 3)
        r = np.linalg.norm(pts, axis=1).max()
        assert r <= 1.0 + 1e-5, (fam, r)
        # deterministic
        pts2 = synthetic_surface(fam, seed=0, n_points=512)
        np.testing.assert_array_equal(pts, pts2)


def test_min_distances_matches_scipy(rng):
    from scipy.spatial.distance import cdist
    dense = rng.normal(size=(500, 3)).astype(np.float32)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    got = min_distances(q, dense)
    want = cdist(q, dense).min(1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gt_generation_invariants(rng):
    dense = synthetic_surface("sphere", seed=1, n_points=2000)
    surface, near, far = generate_gt_for_points(
        dense, eps=0.05, num_neg_points=500, rng=rng
    )
    # scaled by 0.8
    np.testing.assert_allclose(surface, dense[:, :3] * 0.8, atol=1e-6)
    assert near.shape == (500, 4) and far.shape == (500, 4)
    # near band: min_eps < d < 2*eps (d computed vs the scaled surface)
    assert (near[:, 3] > 0.001).all() and (near[:, 3] < 0.1).all()
    # far (excluding the outside-sphere tail replacements): d > 2*eps
    assert (far[:450, 3] > 0.1).all()
    # last 10% outside the unit sphere
    tail = far[-50:]
    assert (np.linalg.norm(tail[:, :3], axis=1) > 1).all()
    # GT distances are true min distances to the scaled surface
    d_check = min_distances(near[:, :3].astype(np.float32), surface)
    np.testing.assert_allclose(near[:, 3], d_check, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthdata"))
    generate_synthetic_dataset(
        root, families=("chair",), n_train=3, n_test=1,
        n_surface=600, num_neg_points=300, seed=0,
    )
    return root


def test_dataset_loader_shapes(tiny_dataset):
    ds = SurfacePairDataset(tiny_dataset, batch_size=2, npoints=32,
                            split="train", class_choice="chair",
                            num_neg_points=300, seed=0)
    assert len(ds) == 3
    data, labels = ds.next_batch()
    assert data.shape == (2, 96, 3)
    assert labels.shape == (2, 64)
    # labels are nonnegative distances
    assert (labels >= 0).all()


def test_batch_assembly_semantics(tiny_dataset):
    ds = SurfacePairDataset(tiny_dataset, batch_size=2, npoints=32,
                            split="train", num_neg_points=300, seed=0)
    data, labels = ds.next_batch()
    pcA, pcB, lab = assemble_dpdist_batch(data, labels)
    N = 16  # npoints = 2*N
    assert pcA.shape == (2, N, 3) and pcB.shape == (2, N, 3)
    assert lab.shape == (2, N)
    # first half of labels_AB are exactly zero (surface points)
    np.testing.assert_array_equal(lab[:, : N // 2], 0.0)
    # pcA points come from the surface block
    surface = data[:, :32]
    for b in range(2):
        for p in pcA[b]:
            assert (np.abs(surface[b] - p).sum(1) < 1e-6).any()


def test_dataset_iteration_and_reset(tiny_dataset):
    ds = SurfacePairDataset(tiny_dataset, batch_size=2, npoints=16,
                            split="train", num_neg_points=300)
    n = 0
    while ds.has_next_batch():
        ds.next_batch()
        n += 1
    assert n == 2  # ceil(3/2)
    ds.reset()
    assert ds.has_next_batch()


def test_uniform_sampling_schemes(rng):
    """dataset_sample_with_gt.py:141-188: every non-cube scheme samples
    inside the unit ball; the default (dropped_coordinates) is uniform in
    VOLUME, so r^3 is uniform on [0,1] (mean 0.5)."""
    from dpdist_tpu.data import uniform_sampling, SAMPLING_SCHEMES

    n = 20000
    for scheme in SAMPLING_SCHEMES:
        pts = uniform_sampling(np.random.default_rng(0), n, scheme)
        assert pts.shape == (n, 3)
        r = np.linalg.norm(pts, axis=1)
        if scheme == "cube":
            assert np.abs(pts).max() <= 1.0
            assert r.max() > 1.0  # corners exist — the old behavior
        else:
            assert r.max() <= 1.0 + 1e-6
    r3 = np.linalg.norm(
        uniform_sampling(np.random.default_rng(1), n, "dropped_coordinates"),
        axis=1) ** 3
    assert abs(r3.mean() - 0.5) < 0.01
    for bad in ("nope",):
        import pytest

        with pytest.raises(ValueError):
            uniform_sampling(np.random.default_rng(0), 4, bad)


def test_gtgen_scheme_flows_through(tmp_path, rng):
    """generate_gt_for_points with the default scheme: near/far labels are
    true min distances and non-outside far points lie in the ball."""
    from dpdist_tpu.data import generate_gt_for_points
    from scipy.spatial.distance import cdist

    dense = rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32)
    surface, near, far = generate_gt_for_points(
        dense, num_neg_points=200, rng=np.random.default_rng(0))
    want = cdist(near[:, :3], surface).min(1)
    np.testing.assert_allclose(near[:, 3], want, rtol=1e-3, atol=1e-4)
    # all but the forced-outside 10% tail came from the unit ball
    r = np.linalg.norm(far[:-20, :3], axis=1)
    assert r.max() <= 1.0 + 1e-6
    assert np.linalg.norm(far[-20:, :3], axis=1).min() > 1.0


def test_augmentations_preserve_shape(rng):
    batch = rng.normal(size=(2, 64, 3)).astype(np.float32)
    for fn in (augment.rotate_point_cloud, augment.rotate_point_cloud_z,
               augment.rotate_perturbation_point_cloud,
               augment.jitter_point_cloud, augment.shift_point_cloud,
               augment.random_scale_point_cloud, augment.random_point_dropout,
               augment.shuffle_points, augment.augment_batch):
        out = fn(batch, np.random.default_rng(0))
        assert out.shape == batch.shape
        assert out.dtype == np.float32


def test_with_normal_variants_rotate_normals_consistently(rng):
    """The *_with_normal variants (provider.py:72-160) must apply the SAME
    rotation to the xyz and normal channels: point-normal dot products are
    rotation invariants."""
    pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
    nrm = rng.normal(size=(2, 32, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=2, keepdims=True)
    batch6 = np.concatenate([pts, nrm], axis=2)
    dots = (pts * nrm).sum(2)
    for fn in (
        lambda b: augment.rotate_point_cloud_with_normal(b, np.random.default_rng(1)),
        lambda b: augment.rotate_perturbation_point_cloud_with_normal(b, np.random.default_rng(1)),
        lambda b: augment.rotate_point_cloud_by_angle_with_normal(b, 0.7),
    ):
        out = fn(batch6)
        assert out.shape == batch6.shape and out.dtype == np.float32
        np.testing.assert_allclose((out[..., :3] * out[..., 3:]).sum(2), dots,
                                   atol=1e-4)
        np.testing.assert_allclose(np.linalg.norm(out[..., 3:], axis=2), 1.0,
                                   atol=1e-4)
    # original array untouched (the reference mutates in place; we don't)
    np.testing.assert_array_equal(batch6[..., :3], pts)


def test_with_normal_xyz_matches_plain_variant(rng):
    """Same RNG stream => the xyz part of the with-normal fn equals the
    plain fn (they draw identically: one uniform / 3 normals per cloud)."""
    pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
    batch6 = np.concatenate([pts, pts], axis=2)
    a = augment.rotate_point_cloud(pts, np.random.default_rng(7))
    b = augment.rotate_point_cloud_with_normal(batch6, np.random.default_rng(7))
    np.testing.assert_allclose(a, b[..., :3], atol=1e-5)
    a = augment.rotate_perturbation_point_cloud(pts, np.random.default_rng(7))
    b = augment.rotate_perturbation_point_cloud_with_normal(
        batch6, np.random.default_rng(7))
    np.testing.assert_allclose(a, b[..., :3], atol=1e-5)


def test_shuffle_data_coshuffles(rng):
    data = rng.normal(size=(6, 4, 3)).astype(np.float32)
    labels = np.arange(6)
    d, l, idx = augment.shuffle_data(data, labels, np.random.default_rng(3))
    np.testing.assert_array_equal(d, data[idx])
    np.testing.assert_array_equal(l, labels[idx])


def test_rotation_preserves_norms(rng):
    batch = rng.normal(size=(2, 64, 3)).astype(np.float32)
    out = augment.rotate_point_cloud(batch, np.random.default_rng(0))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=2), np.linalg.norm(batch, axis=2), atol=1e-4
    )


def test_synthetic_surface_stable_across_processes():
    """Template geometry must not depend on Python's per-process hash salt.

    Regression: synthetic_surface seeded its RNG with hash((family, seed)),
    so every process (PYTHONHASHSEED salt) generated different templates —
    the fixed-pose eval protocol was only reproducible within one process.
    """
    import hashlib
    import os
    import subprocess
    import sys

    prog = ("import numpy as np, hashlib;"
            "from dpdist_tpu.data.synthetic import synthetic_surface;"
            "p = synthetic_surface('chair', seed=7, n_points=256);"
            "print(hashlib.sha256(p.tobytes()).hexdigest())")
    digests = []
    for salt in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=salt, JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", prog], check=True,
                             capture_output=True, text=True, env=env)
        digests.append(out.stdout.strip().splitlines()[-1])
    assert digests[0] == digests[1]
    # and the in-process value matches the subprocess value
    from dpdist_tpu.data.synthetic import synthetic_surface

    here = hashlib.sha256(
        synthetic_surface("chair", seed=7, n_points=256).tobytes()).hexdigest()
    assert here == digests[0]
