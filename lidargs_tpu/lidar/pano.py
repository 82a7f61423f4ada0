"""Range-view (panorama) <-> point-cloud transforms, fully vectorized.

Replaces the reference's per-point Python loops (`utils/lidar_utils.py:51-231`)
with numpy/JAX array ops. Conventions (identical to the reference):

  * azimuth:  beta = pi - atan2(y, x); column c = beta / (2*pi/W). The
    inverse per-pixel mapping is beta = -(c - W/2)/W * 2*pi.
  * elevation: alpha = atan2(z, sqrt(x^2+y^2)); beam tables ascend, row
    r = H-1-beam_index (row 0 is the highest beam).
  * a range value of 0 means "no return" (ray dropped).

Note: the reference's `lidar_to_pano_with_intensities` maps r = H - beam
(`utils/lidar_utils.py:94`), off by one vs. every other code path (e.g.
`lidar_to_pano_with_grad:151` uses H - beam - 1) — which silently drops the
lowest beam. We use the consistent H-1-beam everywhere.
"""
from __future__ import annotations

import numpy as np


def find_closest_beam(beams: np.ndarray, angles: np.ndarray) -> np.ndarray:
    """Nearest beam index per angle (vectorized `find_closest_label`,
    `utils/lidar_utils.py:33-48`): clamp below/above, else the nearer of the
    two bracketing beams (ties -> lower index)."""
    beams = np.asarray(beams)
    angles = np.asarray(angles)
    pos = np.searchsorted(beams, angles, side="left")
    pos = np.clip(pos, 1, len(beams) - 1)
    before = beams[pos - 1]
    after = beams[pos]
    nearer_after = (after - angles) < (angles - before)
    idx = np.where(nearer_after, pos, pos - 1)
    idx = np.where(angles >= beams[-1], len(beams) - 1, idx)
    idx = np.where(angles <= beams[0], 0, idx)
    return idx


def lidar_to_pano_with_intensities(
    points_with_intensities: np.ndarray,
    H: int,
    W: int,
    beam_inclinations: np.ndarray | None = None,
    lidar_K: tuple[float, float] | None = None,
    max_depth: float = 80.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Bin a point cloud (in sensor frame) into (range, intensity) panoramas
    with a min-depth z-buffer. Vectorized equivalent of
    `utils/lidar_utils.py:51-111` (see module docstring for the row fix)."""
    pts = np.asarray(points_with_intensities, dtype=np.float64)
    xyz = pts[:, :3]
    inten = pts[:, 3]
    dist = np.linalg.norm(xyz, axis=1)

    beta = np.pi - np.arctan2(xyz[:, 1], xyz[:, 0])
    c = np.round(beta / (2.0 * np.pi / W)).astype(np.int64)
    alpha = np.arctan2(xyz[:, 2], np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2))
    if beam_inclinations is not None:
        r = H - 1 - find_closest_beam(beam_inclinations, alpha)
    else:
        fov_up, fov = lidar_K
        fov_down = fov - fov_up
        a = alpha + fov_down / 180.0 * np.pi
        r = np.round(H - a / (fov / 180.0 * np.pi / H)).astype(np.int64)

    ok = (dist < max_depth) & (r >= 0) & (r < H) & (c >= 0) & (c < W)
    r, c, dist, inten = r[ok], c[ok], dist[ok], inten[ok]

    # z-buffer: write points far-to-near so the nearest wins for both range
    # and intensity (matches the reference's sequential min-update).
    order = np.argsort(-dist, kind="stable")
    pano = np.zeros((H, W))
    intensities = np.zeros((H, W))
    pano[r[order], c[order]] = dist[order]
    intensities[r[order], c[order]] = inten[order]
    return pano, intensities


def ray_dirs_from_beams(H: int, W: int, beam_inclinations: np.ndarray) -> np.ndarray:
    """[H, W, 3] unit ray directions in the sensor frame, identical to the
    reference's per-frame dirs (`scene/dataset_readers.py:446-455`)."""
    i = np.arange(W, dtype=np.float64)[None, :]
    beta = -(i - W / 2.0) / W * 2.0 * np.pi
    alpha = np.asarray(beam_inclinations, dtype=np.float64)[::-1][:, None]
    return np.stack(
        [
            np.cos(alpha) * np.cos(beta) * np.ones((H, W)),
            np.cos(alpha) * np.sin(beta) * np.ones((H, W)),
            np.sin(alpha) * np.ones((1, W)) * np.ones((H, W)),
        ],
        axis=-1,
    )


def pano_to_lidar_with_intensities(
    pano: np.ndarray,
    intensities: np.ndarray,
    beam_inclinations: np.ndarray | None = None,
    lidar_K: tuple[float, float] | None = None,
) -> np.ndarray:
    """(H, W) range + intensity panoramas -> [N, 4] sensor-frame points.
    Vectorized `pano_to_lidar_with_intensities` (`utils/lidar_utils.py:171-214`)."""
    H, W = pano.shape
    if beam_inclinations is not None:
        dirs = ray_dirs_from_beams(H, W, beam_inclinations)
    else:
        fov_up, fov = lidar_K
        i = np.arange(W, dtype=np.float64)[None, :]
        j = np.arange(H, dtype=np.float64)[:, None]
        beta = -(i - W / 2.0) / W * 2.0 * np.pi
        alpha = (fov_up - j / H * fov) / 180.0 * np.pi
        dirs = np.stack(
            [
                np.cos(alpha) * np.cos(beta),
                np.cos(alpha) * np.sin(beta),
                np.sin(alpha) * np.ones((H, W)),
            ],
            axis=-1,
        )
    pts = dirs * pano[..., None]
    out = np.concatenate([pts, intensities[..., None]], axis=-1)
    keep = pano != 0.0
    return out[keep]


def pano_to_lidar(
    pano: np.ndarray,
    beam_inclinations: np.ndarray | None = None,
    lidar_K: tuple[float, float] | None = None,
) -> np.ndarray:
    """(H, W) range panorama -> [N, 3] points (`utils/lidar_utils.py:216-231`)."""
    return pano_to_lidar_with_intensities(
        pano, np.zeros_like(pano), beam_inclinations=beam_inclinations, lidar_K=lidar_K
    )[:, :3]
