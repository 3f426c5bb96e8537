import numpy as np
import pytest
from scipy.spatial import cKDTree

from mvs_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library not built and toolchain unavailable")
    return native.load()


def test_nn_distances_matches_scipy(lib):
    rng = np.random.default_rng(0)
    target = rng.uniform(0, 100, (20000, 3)).astype(np.float32)
    query = rng.uniform(-10, 110, (5000, 3)).astype(np.float32)
    got = native.nn_distances(query, target)
    want = cKDTree(target).query(query, k=1, workers=-1)[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nn_distances_empty_target(lib):
    out = native.nn_distances(np.zeros((3, 3), np.float32),
                              np.zeros((0, 3), np.float32))
    assert np.isinf(out).all()


def test_reduce_points_semantics(lib):
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 10, (3000, 3)).astype(np.float32)
    keep = native.reduce_points_mask(pts, dst=1.0, seed=0)
    kept = pts[keep]
    d, _ = cKDTree(kept).query(kept, k=2, workers=-1)
    assert d[:, 1].min() >= 1.0 - 1e-5
    assert 0 < keep.sum() < len(pts)
    # Maximality: every removed point has a kept point within dst.
    d_removed, _ = cKDTree(kept).query(pts[~keep], k=1, workers=-1)
    assert d_removed.max() <= 1.0 + 1e-5


def test_reduce_points_matches_python_reference(lib):
    """Same seed => identical greedy visit order => identical keep mask."""
    from mvs_tpu.dtu_eval.protocol import reduce_points

    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 5, (800, 3)).astype(np.float32)
    native_mask = native.reduce_points_mask(pts, dst=0.5, seed=7)
    python_mask = reduce_points(pts, dst=0.5, seed=7, use_native=False)
    np.testing.assert_array_equal(native_mask, python_mask)
