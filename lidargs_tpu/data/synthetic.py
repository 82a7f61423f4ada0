"""Synthetic multi-view LiDAR dataset with consistent geometry.

Generates an AlignMiF-format dataset (transforms_train/test.json + npy
range images) by analytically ray-casting a procedural world — ground
plane + random spheres — from a sensor moving along +x. Unlike random
range images, every frame observes the SAME world, so a field trained on
it must actually converge (the end-to-end validation the reference lacks,
SURVEY.md §4).
"""
from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from ..lidar.beams import uniform_beam_inclinations


def _ray_grid(H: int, W: int, beams: np.ndarray) -> np.ndarray:
    rows = np.arange(H)
    cols = np.arange(W)
    alpha = beams[H - 1 - rows][:, None]
    beta = -(cols[None, :] - W / 2.0) / W * 2.0 * np.pi
    return np.stack(
        [np.cos(alpha) * np.cos(beta), np.cos(alpha) * np.sin(beta),
         np.sin(alpha) * np.ones_like(beta)], -1
    )


def raycast_world(origin: np.ndarray, dirs: np.ndarray, spheres: np.ndarray,
                  albedo: np.ndarray, ground_z: float = 0.0,
                  far: float = 75.0) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic depth+intensity: nearest hit of ground plane / spheres.
    spheres: [S, 4] (cx, cy, cz, r); albedo: [S+1] (ground first)."""
    H, W, _ = dirs.shape
    depth = np.full((H, W), np.inf)
    mat = np.full((H, W), -1, np.int64)

    dz = dirs[..., 2]
    t_g = np.where(dz < -1e-6, (ground_z - origin[2]) / np.where(dz < -1e-6, dz, 1.0),
                   np.inf)
    hit_g = t_g < depth
    depth = np.where(hit_g, t_g, depth)
    mat = np.where(hit_g, 0, mat)

    for i, (cx, cy, cz, r) in enumerate(spheres):
        oc = origin - np.array([cx, cy, cz])
        b = 2.0 * (dirs @ oc)
        c = oc @ oc - r * r
        disc = b * b - 4.0 * c
        ok = disc > 0
        t = np.where(ok, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, np.inf)
        t = np.where(t > 0.1, t, np.inf)
        closer = t < depth
        depth = np.where(closer, t, depth)
        mat = np.where(closer, i + 1, mat)

    inten = np.where(mat >= 0, albedo[np.maximum(mat, 0)], 0.0)
    # mild lambertian-ish range falloff for realism
    inten = inten * np.clip(1.0 - depth / (2.0 * far), 0.2, 1.0)
    drop = (depth > far) | ~np.isfinite(depth)
    depth = np.where(drop, 0.0, depth)
    inten = np.where(drop, 0.0, inten)
    return depth.astype(np.float32), inten.astype(np.float32)


def make_world_dataset(root: str, n_frames: int = 50, H: int = 32,
                       W: int = 1024, n_spheres: int = 40,
                       seed: int = 0) -> None:
    """Write an AlignMiF-format dataset of a consistent procedural world."""
    rng = np.random.default_rng(seed)
    beams = uniform_beam_inclinations(3.0, 25.0, H)
    dirs = _ray_grid(H, W, beams)

    road_len = n_frames * 0.6
    spheres = np.stack([
        rng.uniform(-10, road_len + 10, n_spheres),
        rng.uniform(-18, 18, n_spheres),
        rng.uniform(0.5, 3.0, n_spheres),
        rng.uniform(0.8, 3.0, n_spheres),
    ], -1)
    albedo = np.concatenate([[0.35], rng.uniform(0.3, 1.0, n_spheres)])

    os.makedirs(os.path.join(root, "lidar"), exist_ok=True)
    test_idx = {10, 20, 31, 41} if n_frames >= 42 else set()
    frames_train, frames_test = [], []
    for i in range(n_frames):
        l2w = np.eye(4)
        l2w[:3, 3] = [0.6 * i, 0.0, 2.0]
        # sensor frame == world orientation; rays cast from the pose origin
        depth, inten = raycast_world(l2w[:3, 3], dirs, spheres, albedo)
        rv = np.stack([np.zeros_like(depth), inten, depth], -1)
        fname = f"lidar/frame_{i:03d}.npy"
        np.save(os.path.join(root, fname), rv)
        meta = {"file_path": fname, "lidar_file_path": fname,
                "lidar2world": l2w.tolist()}
        (frames_test if i in test_idx else frames_train).append(meta)

    base = {
        "w_lidar": W, "h_lidar": H,
        "fl_x": 1.0, "fl_y": 1.0, "cx": 0.5, "cy": 0.5, "w": W, "h": H,
        "beam_inclinations": beams.tolist(),
    }
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({**base, "frames": frames_train}, f)
    with open(os.path.join(root, "transforms_test.json"), "w") as f:
        json.dump({**base, "frames": frames_test}, f)
