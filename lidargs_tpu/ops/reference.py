"""Golden O(P*HW) renderer — the test oracle.

The reference ships no tests (SURVEY.md §4); this pure-JAX renderer fills
that void: all gaussians, globally depth-sorted, composited against every
pixel with the exact per-pixel semantics of renderCUDA (forward.cu:502-641)
including the parity-rect masking. The tiled production path must match it
bit-for-bit (same chunk size => same reduction order).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import RasterConfig
from .composite import composite_depth_ordered, pixel_rays
from .projection import Splats


def render_reference(splats: Splats, beams: jnp.ndarray, W: int,
                     bg: jnp.ndarray, cfg: RasterConfig):
    """Returns (color [C,H,W], depth [H,W], occ [H,W], final_T [H,W])."""
    H = beams.shape[0]
    P = splats.depth.shape[0]

    order = jnp.argsort(splats.depth)                 # invalid -> inf -> last
    sorted_ids = order[None, :]                       # one list = whole image
    sorted_valid = jnp.take(splats.valid, order)[None, :]

    rows = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)[None, :]
    cols = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)[None, :]
    dirs = pixel_rays(rows[0], cols[0], beams, W)[None, ...]

    out = composite_depth_ordered(splats, sorted_ids, sorted_valid,
                                  dirs, cols, rows, cfg)
    C = splats.feat.shape[-1]
    color = out.color.reshape(C, H, W) + out.final_T.reshape(1, H, W) * bg[:, None, None]
    depth = out.depth.reshape(H, W)
    final_T = out.final_T.reshape(H, W)
    return color, depth, 1.0 - final_T, final_T
