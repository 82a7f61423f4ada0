"""Native C++ runtime ops vs their NumPy/JAX references."""
import numpy as np
import pytest

from lidargs_tpu import native
from lidargs_tpu.lidar.beams import uniform_beam_inclinations
from lidargs_tpu.lidar.pano import pano_to_lidar_with_intensities


def test_native_builds():
    assert native.native_available(), "g++ build of lidargs_native failed"


def test_knn3_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    out = native.knn3_mean_sq_dist(pts)
    # brute force oracle
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out, want, rtol=1e-4)


def test_knn3_clustered_distribution():
    """Grid search must survive highly non-uniform densities."""
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.05, (300, 3))
    b = rng.normal(50, 5.0, (300, 3)) * np.array([1, 1, 0.01])
    pts = np.concatenate([a, b]).astype(np.float32)
    out = native.knn3_mean_sq_dist(pts)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out, want, rtol=1e-4)


@pytest.mark.heavy  # 500k-point scale check (20s)
def test_knn3_scales_to_init_cloud():
    """The reference init cloud is 500k points (dataset_readers.py:466);
    grid KNN must handle it quickly (brute force would be 2.5e11 pairs)."""
    import time

    rng = np.random.default_rng(2)
    n = 500_000
    az = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(3, 75, n)
    pts = np.stack([r * np.cos(az), r * np.sin(az),
                    rng.uniform(-2, 4, n)], -1).astype(np.float32)
    t0 = time.perf_counter()
    out = native.knn3_mean_sq_dist(pts)
    dt = time.perf_counter() - t0
    assert np.isfinite(out).all() and (out >= 0).all()
    assert dt < 30.0, f"native 3-NN too slow: {dt:.1f}s"
    # spot-check 50 random rows against brute force
    idx = rng.integers(0, n, 50)
    d2 = ((pts[idx][:, None] - pts[None]) ** 2).sum(-1)
    d2[np.arange(50), idx] = np.inf
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out[idx], want, rtol=1e-4)


def test_voxel_unique_matches_numpy():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-30, 30, (20_000, 3))
    pts = np.concatenate([pts, pts[:5_000]])      # duplicates
    for vs in (0.25, 1.0, 3.7):
        got = native.voxel_unique(pts, vs)
        want = np.unique(np.round(pts / vs), axis=0) * vs
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_pano_to_points_matches_numpy():
    rng = np.random.default_rng(4)
    H, W = 16, 128
    beams = uniform_beam_inclinations(5.0, 20.0, H)
    pano = rng.uniform(0, 60, (H, W)).astype(np.float32)
    pano[rng.uniform(size=(H, W)) < 0.4] = 0.0
    inten = rng.uniform(0, 1, (H, W)).astype(np.float32)
    got = native.pano_to_points(pano, inten, beams)
    want = pano_to_lidar_with_intensities(pano, inten, beams)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
