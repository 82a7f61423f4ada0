"""Golden-fixture test pinning the reader chain to the reference pipeline.

The reference's de-facto data contract is its own NumPy projection script
(`/root/reference/submodules/diff_lidargs_rasterization/python_imp/imp.py:46-196`,
identical math in `utils/lidar_utils.py:51-111`): point cloud -> range view
via beta = pi - atan2(y, x), nearest-beam row by bisect, min-depth z-buffer;
and the inverse per-pixel mapping beta = -(c - W/2)/W * 2*pi with the
REVERSED beam table (`utils/lidar_utils.py:171-214`,
`scene/dataset_readers.py:446-455`).

This file generates a tiny AlignMiF-format bundle whose range images come
from a deliberate SCALAR float64 transliteration of that reference math
(an independent spec check in the spirit of tests/oracle_projection.py — it
shares no code with lidargs_tpu.lidar.pano, which is vectorized), then
drives `read_lidar_scene` over it and checks the full chain bit-for-bit:
pano construction, GT channel layout, back-projected init cloud, and ray
directions.
"""
from __future__ import annotations

import json
from bisect import bisect_left

import numpy as np
import pytest

from lidargs_tpu.data.waymo import read_lidar_scene
from lidargs_tpu.lidar.pano import (
    find_closest_beam,
    lidar_to_pano_with_intensities,
    pano_to_lidar,
    ray_dirs_from_beams,
)

H, W = 16, 96
MAX_DEPTH = 80.0


def _ref_find_closest_label(beam_labels, angle):
    """Scalar transliteration of the reference's nearest-beam bisect
    (utils/lidar_utils.py:33-48)."""
    if angle >= beam_labels[-1]:
        return len(beam_labels) - 1
    if angle <= beam_labels[0]:
        return 0
    pos = bisect_left(beam_labels, angle)
    before = beam_labels[pos - 1]
    after = beam_labels[pos]
    return pos if after - angle < angle - before else pos - 1


def _ref_lidar_to_pano(points_i, H, W, beams, max_depth=MAX_DEPTH,
                       row_quirk=False):
    """Scalar transliteration of the reference's point->pano loop
    (utils/lidar_utils.py:51-111). row_quirk=True reproduces the published
    `r = H - r` off-by-one (which silently drops the lowest beam and never
    fills row 0); False uses the consistent H-1-r of every other reference
    code path (e.g. lidar_to_pano_with_grad, utils/lidar_utils.py:151)."""
    pano = np.zeros((H, W))
    intensities = np.zeros((H, W))
    for x, y, z, inten in points_i:
        dist = float(np.sqrt(x * x + y * y + z * z))
        if dist >= max_depth:
            continue
        beta = np.pi - np.arctan2(y, x)
        c = int(round(beta / (2 * np.pi / W)))
        alpha = np.arctan2(z, np.sqrt(x * x + y * y))
        r = _ref_find_closest_label(beams, alpha)
        r = H - r if row_quirk else H - 1 - r
        if r >= H or r < 0 or c >= W or c < 0:
            continue
        if pano[r, c] == 0.0 or pano[r, c] > dist:
            pano[r, c] = dist
            intensities[r, c] = inten
    return pano, intensities


def _beams():
    # Waymo-like: non-uniform ascending inclinations
    lo = np.linspace(np.radians(-18.0), np.radians(-2.5), H - 4)
    hi = np.linspace(np.radians(-1.0), np.radians(2.4), 4)
    return np.concatenate([lo, hi])


def _cloud(rng, n=4000):
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.radians(-18.5), np.radians(3.0), n)
    r = rng.uniform(2.0, 95.0, n)  # some beyond max_depth on purpose
    pts = np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
         r * np.sin(el)], -1
    )
    inten = rng.uniform(0.0, 1.4, n)  # some beyond 1 to exercise the clip
    return np.concatenate([pts, inten[:, None]], axis=1)


def test_vectorized_pano_matches_reference_scalar_loop():
    rng = np.random.default_rng(3)
    beams = _beams()
    pts = _cloud(rng)
    ref_pano, ref_int = _ref_lidar_to_pano(pts, H, W, beams)
    pano, inten = lidar_to_pano_with_intensities(pts, H, W, beams)
    np.testing.assert_array_equal(pano, ref_pano)
    np.testing.assert_array_equal(inten, ref_int)


def test_row_quirk_is_exactly_one_row():
    """The reference's published r = H - r variant is our mapping shifted by
    one row, with row 0 unfilled and the lowest beam dropped."""
    rng = np.random.default_rng(4)
    beams = _beams()
    pts = _cloud(rng, n=1500)
    quirk_pano, _ = _ref_lidar_to_pano(pts, H, W, beams, row_quirk=True)
    pano, _ = lidar_to_pano_with_intensities(pts, H, W, beams)
    assert np.all(quirk_pano[0] == 0.0)
    np.testing.assert_array_equal(quirk_pano[1:], pano[:-1])


def test_find_closest_beam_matches_reference_bisect():
    beams = _beams()
    rng = np.random.default_rng(5)
    angles = np.concatenate([
        rng.uniform(beams[0] - 0.1, beams[-1] + 0.1, 500),
        beams,                       # exact hits
        beams[:1] - 1.0, beams[-1:] + 1.0,  # far out of range
        0.5 * (beams[:-1] + beams[1:]),     # midpoints (tie edges)
    ])
    ours = find_closest_beam(beams, angles)
    ref = np.array([_ref_find_closest_label(beams, a) for a in angles])
    np.testing.assert_array_equal(ours, ref)


@pytest.fixture
def golden_bundle(tmp_path):
    """AlignMiF-format bundle (transforms_{train,test}.json + npy range
    images, dataset_readers.py:338-469) whose range images are generated by
    the reference's own projection math from known point clouds."""
    rng = np.random.default_rng(11)
    beams = _beams()
    n_frames = 8  # < first test index (10): all frames are train frames
    frames = []
    clouds = []
    (tmp_path / "rv").mkdir()
    for i in range(n_frames):
        th = 0.05 * i
        l2w = np.eye(4)
        l2w[:3, :3] = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
             [0, 0, 1.0]]
        )
        l2w[:3, 3] = [0.3 * i, -0.1 * i, 0.02 * i]
        pts = _cloud(rng, n=2500)
        pano, inten = _ref_lidar_to_pano(pts, H, W, beams)
        rv = np.zeros((H, W, 3), np.float32)
        rv[:, :, 1] = inten
        rv[:, :, 2] = pano
        np.save(tmp_path / "rv" / f"{i:04d}.npy", rv)
        frames.append({
            "file_path": f"rv/{i:04d}.npy",
            "lidar_file_path": f"rv/{i:04d}.npy",
            "lidar2world": l2w.tolist(),
        })
        clouds.append((pano, l2w))
    meta = {
        "w_lidar": W, "h_lidar": H,
        "beam_inclinations": beams.tolist(),
        "fl_x": 1.0, "fl_y": 1.0, "cx": 0.0, "cy": 0.0, "w": W, "h": H,
        "frames": frames,
    }
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
    (tmp_path / "transforms_test.json").write_text(
        json.dumps({"frames": frames[:1]})
    )
    return tmp_path, beams, clouds


def test_reader_chain_bit_for_bit(golden_bundle):
    path, beams, clouds = golden_bundle
    data = read_lidar_scene(str(path), "waymo", num_frames=len(clouds),
                            init_samples=20_000, seed=0)
    assert data.H == H and data.W == W and data.data_name == "waymo"
    np.testing.assert_array_equal(data.beam_inclinations, beams)
    assert len(data.train_frames) == len(clouds) and not data.test_frames

    for frame, (pano, l2w) in zip(data.train_frames, clouds):
        gt = np.asarray(frame.gt_image)
        # GT channel contract (dataset_readers.py:424-443):
        # [raydrop = depth > 0, clip(intensity, 0, 1), depth]
        np.testing.assert_array_equal(gt[2], pano.astype(np.float32))
        np.testing.assert_array_equal(gt[0], (pano > 0).astype(np.float32))
        assert float(gt[1].max()) <= 1.0
        # pose: the frame's sensor center is l2w @ origin
        np.testing.assert_allclose(np.asarray(frame.center), l2w[:3, 3],
                                   atol=1e-6)

    # back-projection inverse: every init-cloud point is some frame's
    # pano_to_lidar output mapped through l2w; distances round-trip exactly
    pano0, l2w0 = clouds[0]
    pts_local = pano_to_lidar(pano0, beam_inclinations=beams)
    d = np.linalg.norm(pts_local, axis=1)
    np.testing.assert_allclose(np.sort(d), np.sort(pano0[pano0 > 0]),
                               rtol=1e-12)
    # and re-projecting the back-projection reproduces the pano exactly
    # (each point sits exactly on its pixel's ray)
    pts_i = np.concatenate([pts_local, np.zeros((len(pts_local), 1))], 1)
    pano_rt, _ = _ref_lidar_to_pano(pts_i, H, W, beams)
    np.testing.assert_allclose(pano_rt, pano0, rtol=1e-12)


def test_ray_dirs_match_reference_meshgrid(golden_bundle):
    """dirs formula parity (dataset_readers.py:446-455): beta from column,
    alpha = reversed beam table."""
    path, beams, _ = golden_bundle
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    beta = -(i - W / 2.0) / W * 2.0 * np.pi
    alpha = np.expand_dims(beams[::-1], 1).repeat(W, 1)
    ref_dirs = np.stack([
        np.cos(alpha) * np.cos(beta),
        np.cos(alpha) * np.sin(beta),
        np.sin(alpha) * np.ones_like(beta),
    ], -1)
    ours = ray_dirs_from_beams(H, W, beams)
    # the reference meshgrid builds i/j as float32 (dataset_readers.py:447),
    # so beta carries f32 rounding; ours is float64 throughout
    np.testing.assert_allclose(ours, ref_dirs, atol=5e-7)
