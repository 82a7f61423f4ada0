"""Synthetic scenes for tests and benchmarks (the fixtures the reference
never shipped, SURVEY.md §4)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from ..lidar.beams import uniform_beam_inclinations
from ..ops.projection import Splats, preprocess_gaussians


class SyntheticScene(NamedTuple):
    means3d: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray
    opacities: jnp.ndarray
    feat: jnp.ndarray
    mask: jnp.ndarray
    w2s_rot: jnp.ndarray
    w2s_trans: jnp.ndarray
    beams: jnp.ndarray
    W: int


def make_scene(
    key,
    n: int = 256,
    H: int = 32,
    W: int = 256,
    r_min: float = 3.0,
    r_max: float = 60.0,
    scale_px: float = 2.0,
    isotropic: bool = False,
    channels: int = 2,
) -> SyntheticScene:
    """Random gaussians scattered over the sensor's full panorama.

    Scales are chosen so splats span O(scale_px) pixels; elevations stay
    inside the beam FOV so most gaussians survive culling."""
    ks = jax.random.split(key, 6)
    beams = jnp.asarray(uniform_beam_inclinations(12.0, 24.0, H), jnp.float32)

    az = jax.random.uniform(ks[0], (n,), minval=-jnp.pi, maxval=jnp.pi)
    el = jax.random.uniform(
        ks[1], (n,), minval=float(beams[1]) , maxval=float(beams[-2])
    )
    r = jax.random.uniform(ks[2], (n,), minval=r_min, maxval=r_max)
    means = jnp.stack(
        [r * jnp.cos(el) * jnp.cos(az), r * jnp.cos(el) * jnp.sin(az), r * jnp.sin(el)],
        -1,
    )

    # world-unit scale giving ~scale_px pixels at range r
    ang_per_px = 2.0 * jnp.pi / W
    base = r * jnp.tan(ang_per_px) * scale_px
    if isotropic:
        scales = jnp.repeat(base[:, None], 3, axis=1)
    else:
        mult = jax.random.uniform(ks[3], (n, 3), minval=0.5, maxval=2.0)
        scales = base[:, None] * mult

    if isotropic:
        quats = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
    else:
        q = jax.random.normal(ks[4], (n, 4))
        quats = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    opac = jax.random.uniform(ks[5], (n,), minval=0.3, maxval=0.95)
    feat = jax.random.uniform(jax.random.fold_in(key, 7), (n, channels))

    return SyntheticScene(
        means3d=means.astype(jnp.float32),
        scales=scales.astype(jnp.float32),
        quats=quats.astype(jnp.float32),
        opacities=opac.astype(jnp.float32),
        feat=feat.astype(jnp.float32),
        mask=jnp.ones((n,), bool),
        w2s_rot=jnp.eye(3, dtype=jnp.float32),
        w2s_trans=jnp.zeros(3, jnp.float32),
        beams=beams,
        W=W,
    )


def scene_splats(sc: SyntheticScene, cfg: RasterConfig) -> Splats:
    return preprocess_gaussians(
        sc.means3d, sc.scales, sc.quats, sc.opacities, sc.feat, sc.mask,
        sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, cfg,
    )
