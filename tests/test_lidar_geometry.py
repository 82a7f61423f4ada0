"""Geometry-core tests: beam tables, pano round trips, ray dirs."""
import numpy as np

from lidargs_tpu.lidar import (
    uniform_beam_inclinations,
    helios_beam_inclinations,
    pano_to_lidar,
    pano_to_lidar_with_intensities,
    lidar_to_pano_with_intensities,
    ray_dirs_from_beams,
    find_closest_beam,
)


def test_uniform_beams_ascending_and_bounds():
    b = uniform_beam_inclinations(2.0, 26.9, 66)
    assert b.shape == (66,)
    assert np.all(np.diff(b) > 0)
    assert np.isclose(b[-1], np.radians(2.0))
    # lowest beam = fov_up - fov*(H-1)/H
    assert np.isclose(b[0], np.radians(2.0 - 26.9 * 65 / 66))


def test_helios_profile():
    b = helios_beam_inclinations()
    assert b.shape == (32,)
    assert np.all(np.diff(b) > 0)
    assert np.isclose(b[0], np.radians(-55))
    assert np.isclose(b[-1], np.radians(15))


def test_find_closest_beam_matches_bisect_reference():
    from bisect import bisect_left

    def ref(beams, angle):  # utils/lidar_utils.py:33-48
        if angle >= beams[-1]:
            return len(beams) - 1
        if angle <= beams[0]:
            return 0
        pos = bisect_left(beams, angle)
        before, after = beams[pos - 1], beams[pos]
        return pos if after - angle < angle - before else pos - 1

    rng = np.random.default_rng(0)
    beams = np.sort(rng.uniform(-0.4, 0.1, 64))
    angles = rng.uniform(-0.5, 0.2, 500)
    got = find_closest_beam(beams, angles)
    want = np.array([ref(list(beams), a) for a in angles])
    np.testing.assert_array_equal(got, want)


def test_pano_roundtrip():
    """pano -> points -> pano must be the identity on occupied pixels."""
    rng = np.random.default_rng(1)
    H, W = 32, 256
    beams = uniform_beam_inclinations(10.0, 25.0, H)
    pano = rng.uniform(2.0, 70.0, (H, W))
    pano[rng.uniform(size=(H, W)) < 0.3] = 0.0  # ray drops
    inten = rng.uniform(0, 1, (H, W)) * (pano > 0)

    pts = pano_to_lidar_with_intensities(pano, inten, beam_inclinations=beams)
    pano2, inten2 = lidar_to_pano_with_intensities(pts, H, W, beam_inclinations=beams)
    np.testing.assert_allclose(pano2, pano, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(inten2, inten, rtol=1e-6, atol=1e-9)


def test_ray_dirs_unit_norm_and_convention():
    H, W = 16, 128
    beams = uniform_beam_inclinations(5.0, 20.0, H)
    dirs = ray_dirs_from_beams(H, W, beams)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-12)
    # row 0 carries the highest beam
    assert np.isclose(dirs[0, 0, 2], np.sin(beams[-1]))
    # column W/2 looks along beta=0 -> +x
    mid = dirs[H // 2, W // 2]
    assert mid[0] > 0 and abs(mid[1]) < 1e-9


def test_pano_to_lidar_depth_preserved():
    H, W = 8, 64
    beams = uniform_beam_inclinations(5.0, 20.0, H)
    pano = np.zeros((H, W))
    pano[3, 10] = 12.5
    pts = pano_to_lidar(pano, beam_inclinations=beams)
    assert pts.shape == (1, 3)
    assert np.isclose(np.linalg.norm(pts[0]), 12.5)


def test_chamfer_distance_and_fscore_vs_numpy():
    """Blocked MXU chamfer == brute-force numpy, with and without the
    static-capacity padding used by the eval sweep (chamfer_3D semantics,
    extern/chamfer3D/chamfer3D.cu:9-228 + extern/fscore.py:4-18)."""
    import numpy as np

    from lidargs_tpu.ops.knn import chamfer_distance, fscore

    rng = np.random.default_rng(2)
    a = rng.normal(size=(257, 3)).astype(np.float32)
    b = rng.normal(size=(401, 3)).astype(np.float32) * 1.1

    ref_d1 = ((a[:, None] - b[None]) ** 2).sum(-1).min(1)
    ref_d2 = ((b[:, None] - a[None]) ** 2).sum(-1).min(1)
    ref_cd = ref_d1.mean() + ref_d2.mean()

    for cap in (None, 1024):
        cd, d1, d2, v1, v2 = chamfer_distance(a, b, chunk=64, capacity=cap)
        np.testing.assert_allclose(cd, ref_cd, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d1)[np.asarray(v1)], ref_d1,
                                   rtol=1e-4, atol=1e-5)
        f, p1, p2 = fscore(d1, d2, threshold=0.5, v1=v1, v2=v2)
        rp1 = (ref_d1 < 0.5).mean()
        rp2 = (ref_d2 < 0.5).mean()
        np.testing.assert_allclose(p1, rp1, rtol=1e-6)
        np.testing.assert_allclose(p2, rp2, rtol=1e-6)
        np.testing.assert_allclose(f, 2 * rp1 * rp2 / (rp1 + rp2), rtol=1e-6)
