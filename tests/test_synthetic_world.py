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


def test_raycast_box_exact_face_distance():
    """A horizontal ray straight at an axis-aligned facade must return the
    exact perpendicular slab distance, with cos-incidence shading |n.d|."""
    H, W = 4, 360
    beams = np.radians(np.array([-1.5, -0.5, 0.5, 1.5]))  # near-horizontal
    dirs = _ray_grid(H, W, beams)
    box = np.array([[5.0, -10.0, -5.0, 8.0, 10.0, 5.0]])  # wall at x=5
    origin = np.zeros(3)
    depth, inten = raycast_world(
        origin, dirs, np.zeros((0, 4)), np.array([0.4]),
        ground_z=-100.0, boxes=box, box_albedo=np.array([0.8]),
        lambertian=True,
    )
    # +x ray: col where beta=0 -> col = W/2 (beta = -(c - W/2)/W * 2pi)
    c0 = W // 2
    r = 1  # elevation -0.5 deg
    el = np.radians(-0.5)
    expect = 5.0 / np.cos(el)
    np.testing.assert_allclose(depth[r, c0], expect, rtol=1e-6)
    # shading: head-on |n.d| ~ cos(el); a 60-deg-azimuth hit on the same
    # face is dimmer by ~cos(60)/cos(0)
    c60 = int(round(W / 2 - 60 / 360 * W)) % W
    assert depth[r, c60] > 0
    ratio = inten[r, c60] / inten[r, c0]
    np.testing.assert_allclose(ratio, np.cos(np.radians(60.0)), atol=0.03)


def test_street_dataset_structured_and_consistent(tmp_path):
    """make_street_dataset: format + cross-view SDF consistency against the
    analytic box/sphere/ground world is not available directly (the builder
    owns the geometry), so check the observable invariants: planar ground
    rows reconstruct exactly, facades give long vertical runs of ~constant
    depth columns, and two adjacent frames see the same world points."""
    import json as _json
    import os

    from lidargs_tpu.data.synthetic import make_street_dataset

    root = str(tmp_path / "street")
    make_street_dataset(root, n_frames=6, H=32, W=512)
    with open(os.path.join(root, "transforms_train.json")) as f:
        tr = _json.load(f)
    rv0 = np.load(os.path.join(root, tr["frames"][0]["lidar_file_path"]))
    rv1 = np.load(os.path.join(root, tr["frames"][1]["lidar_file_path"]))
    assert rv0.shape == (32, 512, 3)
    hit0 = rv0[..., 2] > 0
    assert hit0.mean() > 0.5, "street scene should be mostly filled"
    # ground check: downward rays that hit the ground (not cars/buildings)
    # satisfy z = o_z + t*dz == 0 exactly; verify the *minimum* reconstruction
    # error over hit pixels is ~0 and many pixels are ground
    beams = np.asarray(tr["beam_inclinations"])
    dirs = _ray_grid(32, 512, beams)
    o0 = np.array(tr["frames"][0]["lidar2world"])[:3, 3]
    pts = o0[None] + dirs[hit0] * rv0[..., 2][hit0][:, None]
    ground_frac = (np.abs(pts[:, 2]) < 1e-3).mean()
    assert ground_frac > 0.1
    # vertical structure: facade/car points stand well above the ground
    # (the +3 deg top beam only reaches ~2.5m at the 8-12m facades)
    assert (pts[:, 2] > 1.0).mean() > 0.05
    # cross-view: frame 1's sensor sees frame-0 world points at consistent
    # ranges — compare a re-raycast is impossible without the geometry, so
    # check translation consistency on the ground plane instead: both
    # frames' ground points lie on z=0
    o1 = np.array(tr["frames"][1]["lidar2world"])[:3, 3]
    hit1 = rv1[..., 2] > 0
    pts1 = o1[None] + dirs[hit1] * rv1[..., 2][hit1][:, None]
    assert (np.abs(pts1[:, 2]) < 1e-3).mean() > 0.1
    # lambertian structure: intensity varies within single surfaces
    inten_hit = rv0[..., 1][hit0]
    assert inten_hit.std() > 0.05
