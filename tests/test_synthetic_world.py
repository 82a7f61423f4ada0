"""Synthetic procedural-world dataset: geometric consistency checks.

The generator is the end-to-end convergence fixture (SURVEY.md §4 notes the
reference ships no tests; a consistent world is what makes a training run a
real regression check rather than noise-fitting).
"""
import json
import os

import numpy as np
import pytest

from lidargs_tpu.data.synthetic import make_world_dataset, raycast_world, _ray_grid
from lidargs_tpu.lidar.beams import uniform_beam_inclinations


def test_world_dataset_format(tmp_path):
    root = str(tmp_path / "ds")
    make_world_dataset(root, n_frames=6, H=8, W=64, n_spheres=4)
    with open(os.path.join(root, "transforms_train.json")) as f:
        tr = json.load(f)
    assert tr["w_lidar"] == 64 and tr["h_lidar"] == 8
    assert len(tr["beam_inclinations"]) == 8
    assert len(tr["frames"]) == 6  # fewer than 42 frames -> no test split
    rv = np.load(os.path.join(root, tr["frames"][0]["lidar_file_path"]))
    assert rv.shape == (8, 64, 3)
    hit = rv[..., 2] > 0
    assert hit.any()
    # intensity only where depth (ray hit) exists
    assert (rv[..., 1][~hit] == 0).all()


def test_raycast_ground_plane_depth():
    """A downward ray from height h must hit the ground at h / |sin(el)|."""
    H, W = 16, 128
    beams = uniform_beam_inclinations(2.0, 20.0, H)
    dirs = _ray_grid(H, W, beams)
    origin = np.array([0.0, 0.0, 2.0])
    depth, inten = raycast_world(origin, dirs, np.zeros((0, 4)), np.array([0.5]))
    dz = dirs[..., 2]
    down = dz < -1e-3
    expect = np.where(down, 2.0 / np.maximum(-dz, 1e-9), 0.0)
    hit = depth > 0
    assert hit[down & (expect < 75.0)].all()
    np.testing.assert_allclose(depth[down & hit], expect[down & hit], rtol=1e-5)


def test_world_multiview_consistency():
    """The same world point seen from two poses must agree: back-project
    frame A's range image to world, re-raycast from pose B, compare."""
    H, W = 32, 256
    beams = uniform_beam_inclinations(3.0, 25.0, H)
    dirs = _ray_grid(H, W, beams)
    rng = np.random.default_rng(3)
    spheres = np.stack([
        rng.uniform(2, 20, 6), rng.uniform(-8, 8, 6),
        rng.uniform(0.5, 2.0, 6), rng.uniform(1.0, 2.5, 6)], -1)
    albedo = np.concatenate([[0.4], rng.uniform(0.3, 1.0, 6)])
    o1 = np.array([0.0, 0.0, 2.0])
    o2 = np.array([1.2, 0.0, 2.0])
    d1, _ = raycast_world(o1, dirs, spheres, albedo)
    d2, _ = raycast_world(o2, dirs, spheres, albedo)
    # world points from frame 1
    hit1 = d1 > 0
    pts = o1 + dirs[hit1] * d1[hit1][:, None]
    # the sphere/plane SDF at those points must be ~0 regardless of the view
    sdf = np.minimum(
        np.abs(pts[:, 2]),
        np.min(np.linalg.norm(pts[:, None] - spheres[None, :, :3], axis=-1)
               - spheres[None, :, 3], axis=1),
    )
    assert np.abs(sdf).max() < 1e-3
    assert hit1.mean() > 0.3 and (d2 > 0).mean() > 0.3
