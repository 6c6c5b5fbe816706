import numpy as np
import pytest

from dpdist_tpu.native import (
    available,
    fast_loadtxt,
    min_distances_native,
    nn_distance_native,
)
from dpdist_tpu.data.prefetch import PrefetchingLoader

pytestmark = pytest.mark.skipif(not available(),
                                reason="native toolchain unavailable")


def test_fast_loadtxt_matches_numpy(tmp_path, rng):
    arr = rng.normal(size=(100, 4)).astype(np.float32)
    p = str(tmp_path / "pts.txt")
    np.savetxt(p, arr, fmt="%.6f", delimiter=",")
    got = fast_loadtxt(p, 4)
    want = np.loadtxt(p, delimiter=",").astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fast_loadtxt_negative_and_exponent(tmp_path):
    p = str(tmp_path / "vals.txt")
    with open(p, "w") as f:
        f.write("-1.5,2.25e-3,0.0\n7,-8e2,+9.5\n")
    got = fast_loadtxt(p, 3)
    np.testing.assert_allclose(got, [[-1.5, 2.25e-3, 0.0], [7, -800, 9.5]])


def test_min_distances_native_matches_scipy(rng):
    from scipy.spatial.distance import cdist
    q = rng.normal(size=(200, 3)).astype(np.float32)
    d = rng.normal(size=(500, 3)).astype(np.float32)
    got = min_distances_native(q, d)
    want = cdist(q, d).min(1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nn_distance_native_matches_bruteforce(rng):
    from scipy.spatial.distance import cdist
    a = rng.normal(size=(50, 3)).astype(np.float32)
    b = rng.normal(size=(80, 3)).astype(np.float32)
    dist, idx = nn_distance_native(a, b)
    D = cdist(a, b) ** 2
    np.testing.assert_allclose(dist, D.min(1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(idx, D.argmin(1))


class _FakeDataset:
    def __init__(self, n):
        self.n = n
        self.i = 0

    def reset(self):
        self.i = 0

    def has_next_batch(self):
        return self.i < self.n

    def next_batch(self, augment=False):
        self.i += 1
        return np.full((2, 3), self.i), np.full((2,), self.i)


def test_prefetching_loader_order_and_completeness():
    ds = _FakeDataset(7)
    loader = PrefetchingLoader(ds, depth=2)
    seen = [int(b[0, 0]) for b, _ in loader.epoch()]
    assert seen == list(range(1, 8))
    # second epoch works (reset happens inside)
    seen2 = [int(b[0, 0]) for b, _ in loader.epoch()]
    assert seen2 == seen


def test_prefetching_loader_abandoned_epoch_recovers():
    """Breaking out of epoch() mid-dataset (consumer exception/retry)
    must retire the producer; the next epoch() yields a clean, complete
    pass — not an interleave of two producers on the shared dataset."""
    import time

    ds = _FakeDataset(50)
    loader = PrefetchingLoader(ds, depth=1)
    it = loader.epoch()
    first = [int(next(it)[0][0, 0]) for _ in range(3)]
    assert first == [1, 2, 3]
    it.close()  # abandon mid-epoch with the producer blocked on put
    time.sleep(0.3)
    seen = [int(b[0, 0]) for b, _ in loader.epoch()]
    assert seen == list(range(1, 51))


def test_prefetching_loader_abandoned_at_sentinel_recovers():
    """ADVICE r2 (medium): abandoning epoch() AFTER the dataset is
    exhausted — producer blocked on the terminal sentinel put with a full
    queue — must not deadlock the next epoch()'s thread.join()."""
    import time

    ds = _FakeDataset(3)
    loader = PrefetchingLoader(ds, depth=1)
    it = loader.epoch()
    assert int(next(it)[0][0, 0]) == 1
    # Let the producer drain the dataset and block on the sentinel put
    # (queue depth 1 already holds item 2).
    time.sleep(0.5)
    it.close()
    seen = [int(b[0, 0]) for b, _ in loader.epoch()]
    assert seen == [1, 2, 3]
