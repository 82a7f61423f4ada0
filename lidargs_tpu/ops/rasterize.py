"""Tiled range-view rasterization — the production render path.

TPU-native replacement for the reference's CUB binning + per-tile CUDA walk
(`rasterizer_impl.cu:202-358`):

  1. cull+compact: valid gaussians are front-packed to a static capacity
     (stable argsort on the validity bit) — the analogue of launching only
     over visible gaussians.
  2. instance expansion: each gaussian emits one instance per touched tile,
     statically bounded by max_tiles_per_gaussian (duplicateWithKeys,
     rasterizer_impl.cu:70-112; the CUDA code has no bound — overflow is
     counted and clipped around the gaussian's center tile).
  3. one stable lexicographic `lax.sort` over (tile, depth) replaces the
     CUB radix sort on packed 64-bit keys (rasterizer_impl.cu:317-322).
  4. per-tile ranges via searchsorted (identifyTileRanges,
     rasterizer_impl.cu:117-139) and a static per-tile instance capacity;
     overflow drops the *farthest* instances (they are occluded first).
  5. compositing: see composite.py.

Physical tiles are lane-aligned (default 1x128) instead of the CUDA 16x1
strips; bit-parity with the reference is preserved through the per-pixel
parity-rect mask computed in projection.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from .composite import composite_depth_ordered, pixel_rays
from .projection import Splats


class RenderOut(NamedTuple):
    color: jnp.ndarray       # [C, H, W] (bg already blended)
    depth: jnp.ndarray       # [H, W]
    occ: jnp.ndarray         # [H, W] 1 - final transmittance
    final_T: jnp.ndarray     # [H, W]
    visible: jnp.ndarray     # [P] bool — per input gaussian (radii > 0)
    n_dropped: jnp.ndarray   # [] valid gaussians beyond max_visible
    n_overflow: jnp.ndarray  # [] instances beyond tile_capacity


def _tile_rects(sp: Splats, cfg: RasterConfig, gx: int, gy: int):
    """Per-gaussian touched-tile window in our physical tiling, clipped to
    max_tiles_per_gaussian around the center tile."""
    tw, th = cfg.tile_w, cfg.tile_h
    rect = sp.pix_rect
    tx0 = rect[:, 0] // tw
    tx1 = -(-rect[:, 1] // tw)
    ty0 = rect[:, 2] // th
    ty1 = -(-rect[:, 3] // th)
    w = jnp.maximum(tx1 - tx0, 0)
    h = jnp.maximum(ty1 - ty0, 0)

    cap = cfg.max_tiles_per_gaussian
    wc = jnp.clip(w, 1, cap)
    hc = jnp.clip(h, 1, jnp.maximum(cap // jnp.maximum(wc, 1), 1))
    cx = jnp.clip((sp.center[:, 0] / tw).astype(jnp.int32), tx0, jnp.maximum(tx1 - 1, tx0))
    cy = jnp.clip((sp.center[:, 1] / th).astype(jnp.int32), ty0, jnp.maximum(ty1 - 1, ty0))
    x0 = jnp.clip(cx - wc // 2, tx0, jnp.maximum(tx1 - wc, tx0))
    y0 = jnp.clip(cy - hc // 2, ty0, jnp.maximum(ty1 - hc, ty0))
    clipped = (w * h > cap).astype(jnp.int32)
    return x0, y0, wc, hc, clipped


def bin_instances(sp: Splats, cfg: RasterConfig, gx: int, gy: int):
    """Expand gaussians to (tile, depth, id) instances, sort, slice per-tile
    lists. Returns ([T, K] gaussian ids, [T, K] validity, overflow count)."""
    V = sp.valid.shape[0]
    T = gx * gy
    cap = cfg.max_tiles_per_gaussian
    x0, y0, wc, hc, _clipped = _tile_rects(sp, cfg, gx, gy)

    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    jx = j % wc[:, None]
    jy = j // wc[:, None]
    inst_ok = (jy < hc[:, None]) & sp.valid[:, None]
    tile = (y0[:, None] + jy) * gx + (x0[:, None] + jx)
    tile = jnp.where(inst_ok, tile, T).astype(jnp.int32)          # sentinel last

    depth = jnp.broadcast_to(sp.depth[:, None], (V, cap))
    gid = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[:, None], (V, cap))

    # stable (tile, depth) sort == CUB radix on tile<<32|depth_bits with
    # instances emitted in gaussian order (rasterizer_impl.cu:70-112,317-322)
    s_tile, _s_depth, s_gid = jax.lax.sort(
        (tile.reshape(-1), depth.reshape(-1), gid.reshape(-1)),
        num_keys=2,
        is_stable=True,
    )

    starts = jnp.searchsorted(s_tile, jnp.arange(T + 1, dtype=jnp.int32))
    counts = starts[1:] - starts[:-1]
    K = cfg.tile_capacity
    idx = starts[:-1, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    valid = jnp.arange(K, dtype=jnp.int32)[None, :] < jnp.minimum(counts, K)[:, None]
    idx = jnp.clip(idx, 0, V * cap - 1)
    ids = jnp.take(s_gid, idx)
    n_overflow = jnp.sum(jnp.maximum(counts - K, 0))
    return ids, valid, n_overflow


def _tile_pixels(H: int, W: int, cfg: RasterConfig, gx: int, gy: int, beams):
    th, tw = cfg.tile_h, cfg.tile_w
    T = gx * gy
    t = jnp.arange(T, dtype=jnp.int32)
    rows = (t // gx)[:, None] * th + jnp.arange(th, dtype=jnp.int32)[None, :]
    cols = (t % gx)[:, None] * tw + jnp.arange(tw, dtype=jnp.int32)[None, :]
    pix_y = jnp.repeat(rows, tw, axis=1)                      # [T, th*tw]
    pix_x = jnp.tile(cols, (1, th))
    safe_rows = jnp.minimum(pix_y, H - 1)
    dirs = pixel_rays(safe_rows, pix_x % W, beams, W)
    return pix_x, pix_y, dirs


def render_tiled(
    splats: Splats,
    beams: jnp.ndarray,
    W: int,
    bg: jnp.ndarray,
    cfg: RasterConfig,
    tile_spec=None,
) -> RenderOut:
    """`tile_spec`: optional jax.sharding.PartitionSpec entry (axis name) to
    shard the per-tile lists over a mesh axis — the net-new multi-chip path
    (SURVEY.md §2.3): tiles are independent after binning, so the
    compositing scan partitions cleanly; only the (cheap) binning sort and
    image reassembly communicate."""
    H = beams.shape[0]
    P = splats.valid.shape[0]
    gy, gx = cfg.grid_shape(H, W)
    C = splats.feat.shape[-1]

    # --- cull + compact to static capacity ---
    V = min(cfg.max_visible, P)
    order = jnp.argsort((~splats.valid).astype(jnp.int8), stable=True)
    sel = order[:V]
    sp = jax.tree.map(lambda x: jnp.take(x, sel, axis=0), splats)
    n_valid_total = jnp.sum(splats.valid)
    n_dropped = n_valid_total - jnp.sum(sp.valid)

    ids, inst_valid, n_overflow = bin_instances(sp, cfg, gx, gy)
    pix_x, pix_y, dirs = _tile_pixels(H, W, cfg, gx, gy, beams)
    if tile_spec is not None:
        from jax.sharding import PartitionSpec as _P

        wsc = jax.lax.with_sharding_constraint
        spec2 = _P(tile_spec, None)
        ids = wsc(ids, spec2)
        inst_valid = wsc(inst_valid, spec2)
        pix_x = wsc(pix_x, spec2)
        pix_y = wsc(pix_y, spec2)
        dirs = wsc(dirs, _P(tile_spec, None, None))

    out = composite_depth_ordered(sp, ids, inst_valid, dirs, pix_x, pix_y, cfg)

    # --- reassemble tiles into the image ---
    th, tw = cfg.tile_h, cfg.tile_w
    color = out.color.reshape(gy, gx, C, th, tw).transpose(2, 0, 3, 1, 4)
    color = color.reshape(C, gy * th, gx * tw)[:, :H, :W]
    depth = out.depth.reshape(gy, gx, th, tw).transpose(0, 2, 1, 3)
    depth = depth.reshape(gy * th, gx * tw)[:H, :W]
    final_T = out.final_T.reshape(gy, gx, th, tw).transpose(0, 2, 1, 3)
    final_T = final_T.reshape(gy * th, gx * tw)[:H, :W]

    color = color + final_T[None] * bg[:, None, None]
    return RenderOut(
        color=color,
        depth=depth,
        occ=1.0 - final_T,
        final_T=final_T,
        visible=splats.valid,
        n_dropped=n_dropped,
        n_overflow=n_overflow,
    )
