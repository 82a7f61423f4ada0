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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from .composite import composite_packed, pixel_rays
from .projection import PackedCols, Splats, pack_splats


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def permutation_rows(pk, sel, V: int):
    """`pk[sel[:V]]` with a gather-based VJP.

    XLA's transpose of a row gather is a scatter-add, which TPU lowers
    near-serially — measured ~6.9 ms for these [131k, 22] rows inside the
    train step (stage_split --grad-prefix, r4), the single largest
    backward term after the composite kernel. But `sel` here is a
    PERMUTATION (the depth-sort order of all P rows), so the transpose is
    itself a permutation-gather: d_pk[r] = d_pkv[inv[r]] for selected rows
    and 0 otherwise, with inv obtained by one more int sort (~1 ms)
    instead of the scatter. Exact, deterministic, no atomics."""
    return jnp.take(pk, sel[:V], axis=0, mode="clip")


def _perm_rows_fwd(pk, sel, V: int):
    return permutation_rows(pk, sel, V), (sel, pk.shape[0])


def _perm_rows_bwd(V, res, d_pkv):
    sel, P = res
    # inverse permutation: sorting the permutation values with their
    # positions as payload yields payload[j] = position of row j in sel
    iota = jnp.arange(P, dtype=jnp.int32)
    _, inv = jax.lax.sort((sel, iota), num_keys=1, is_stable=False)
    d_rows = jnp.take(d_pkv, jnp.minimum(inv, V - 1), axis=0, mode="clip")
    keep = (inv < V).reshape((-1,) + (1,) * (d_rows.ndim - 1))
    d_pk = jnp.where(keep, d_rows, 0.0)
    return (d_pk, np.zeros(sel.shape, dtype=jax.dtypes.float0))


permutation_rows.defvjp(_perm_rows_fwd, _perm_rows_bwd)


class RenderOut(NamedTuple):
    color: jnp.ndarray       # [C, H, W] (bg already blended)
    depth: jnp.ndarray       # [H, W]
    occ: jnp.ndarray         # [H, W] 1 - final transmittance
    final_T: jnp.ndarray     # [H, W]
    visible: jnp.ndarray     # [P] bool — per input gaussian (radii > 0)
    n_dropped: jnp.ndarray   # [] valid gaussians beyond max_visible
    n_overflow: jnp.ndarray  # [] instances beyond tile_capacity


def _tile_rects(rect, center, valid, cfg: RasterConfig, gx: int, gy: int):
    """Per-gaussian touched-tile window in our physical tiling, clipped to
    max_tiles_per_gaussian around the center tile.

    rect: [P, 4] int32 parity rect (x0, x1, y0, y1); center: [P, 2] float."""
    tw, th = cfg.tile_w, cfg.tile_h
    tx0 = rect[:, 0] // tw
    tx1 = -(-rect[:, 1] // tw)
    ty0 = rect[:, 2] // th
    ty1 = -(-rect[:, 3] // th)
    w = jnp.maximum(tx1 - tx0, 0)
    h = jnp.maximum(ty1 - ty0, 0)

    cap = cfg.max_tiles_per_gaussian
    wc = jnp.clip(w, 1, cap)
    hc = jnp.clip(h, 1, jnp.maximum(cap // jnp.maximum(wc, 1), 1))
    cx = jnp.clip((center[:, 0] / tw).astype(jnp.int32), tx0, jnp.maximum(tx1 - 1, tx0))
    cy = jnp.clip((center[:, 1] / th).astype(jnp.int32), ty0, jnp.maximum(ty1 - 1, ty0))
    x0 = jnp.clip(cx - wc // 2, tx0, jnp.maximum(tx1 - wc, tx0))
    y0 = jnp.clip(cy - hc // 2, ty0, jnp.maximum(ty1 - hc, ty0))
    clipped = (w * h > cap).astype(jnp.int32)
    return x0, y0, wc, hc, clipped


def _bin_sorted(rect, center, valid, cfg: RasterConfig, gx: int, gy: int,
                tile_lo=None, n_tiles: int = None):
    """Expand gaussians to (tile, id) instances and sort the fused keys.
    Returns (sorted keys, [Tl+1] window starts, [Tl] raw counts, shift,
    key count, overflow).

    PRECONDITION: the input is already depth-ordered (see render_tiled's
    cull/compact sort), so the gaussian index IS the depth rank. That lets
    the CUB radix sort on packed ``tileID<<32 | float_bits(depth)`` 64-bit
    keys (rasterizer_impl.cu:70-112,317-322) collapse to ONE `lax.sort`
    over a single fused int32 key ``tile << ceil_log2(V) | gid`` — the
    payload rides inside the key, and since every (gaussian, tile) pair is
    unique the keys are distinct and stability is irrelevant.

    `tile_lo` (traced) + `n_tiles` (static) restrict binning to the tile
    window [tile_lo, tile_lo + n_tiles): instances outside are dropped —
    the tile-sharded multi-chip path bins only the tiles a device owns."""
    V = valid.shape[0]
    T = gx * gy
    Tl = T if n_tiles is None else n_tiles
    lo = jnp.int32(0) if tile_lo is None else jnp.asarray(tile_lo, jnp.int32)
    cap = cfg.max_tiles_per_gaussian
    x0, y0, wc, hc, _clipped = _tile_rects(rect, center, valid, cfg, gx, gy)

    shift = max(int(V - 1).bit_length(), 1)
    if shift + int(Tl).bit_length() > 31:
        raise ValueError(
            f"fused binning key overflows int32: V={V} tiles={Tl}; "
            "reduce max_visible or enlarge tiles"
        )
    assert cap <= 64

    E = cfg.instance_capacity
    if E == 0:
        # auto = exact (dense grid). Measured at the bench workload the
        # mean tiles-per-gaussian is ~10 of cap 16 (1x128 tiles make the
        # ROW extent dominate), so an aggressive default budget would
        # silently drop a large fraction of instances with a global-depth
        # policy that is worse than the per-tile nearest-K cap. The budget
        # stays an explicit opt-in, guided by the n_overflow counter.
        E = -1
    n_lost = jnp.zeros((), jnp.int32)
    if E < 0 or E >= V * cap:
        # legacy dense emission grid: every gaussian owns `cap` slots.
        # traced-divisor int div/mod is ~10x a float multiply on the VPU;
        # the float reciprocal floor is exact for j < 64, wc <= 32
        # (verified exhaustively: values are multiples of 1/wc, spacing
        # >= 1/32 >> 2 ulp)
        j = jnp.arange(cap, dtype=jnp.int32)[None, :]
        inv_wc = 1.0 / wc.astype(jnp.float32)[:, None]
        jy = jnp.floor(j.astype(jnp.float32) * inv_wc + 0.01).astype(jnp.int32)
        jx = j - jy * wc[:, None]
        inst_ok = (jy < hc[:, None]) & valid[:, None]
        tile = ((y0[:, None] + jy) * gx + (x0[:, None] + jx)).astype(jnp.int32) - lo
        inst_ok = inst_ok & (tile >= 0) & (tile < Tl)
        tile = jnp.where(inst_ok, tile, Tl)                       # sentinel last
        gid = jnp.arange(V, dtype=jnp.int32)[:, None]
        key = ((tile << shift) | gid).reshape(-1)
        n_keys = V * cap
    else:
        # rank-search emission (the CUB duplicateWithKeys prefix-sum
        # analogue, rasterizer_impl.cu:70-112, without its scatter — a
        # computed scatter is a measured 1.8x pessimization on TPU): slot s
        # maps to gaussian i(s) = searchsorted(offsets, s) and within-rect
        # rank j = s - offsets[i], all gathers. Slots come out in gaussian
        # = depth order, so budget overflow drops the FARTHEST gaussians'
        # instances; the count is reported.
        n_i = jnp.where(valid, wc * hc, 0).astype(jnp.int32)      # <= cap
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_i)]
        )                                                         # [V+1]
        total = offsets[-1]
        s = jnp.arange(E, dtype=jnp.int32)
        i_s = (
            jnp.searchsorted(offsets, s, side="right").astype(jnp.int32) - 1
        )
        i_s = jnp.clip(i_s, 0, V - 1)
        j_s = s - offsets[i_s]
        inv_wc = 1.0 / wc.astype(jnp.float32)
        jy = jnp.floor(
            j_s.astype(jnp.float32) * inv_wc[i_s] + 0.01
        ).astype(jnp.int32)
        jx = j_s - jy * wc[i_s]
        tile = ((y0[i_s] + jy) * gx + (x0[i_s] + jx)).astype(jnp.int32) - lo
        inst_ok = (s < total) & (tile >= 0) & (tile < Tl)
        tile = jnp.where(inst_ok, tile, Tl)
        key = (tile << shift) | i_s
        n_keys = E
        n_lost = jnp.maximum(total - E, 0)

    (s_key,) = jax.lax.sort((key,), num_keys=1, is_stable=False)

    bounds = (jnp.arange(Tl + 1, dtype=jnp.int32) << shift)
    starts = jnp.searchsorted(s_key, bounds).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    K = cfg.tile_capacity
    n_overflow = jnp.sum(jnp.maximum(counts - K, 0)) + n_lost
    return s_key, starts, counts, shift, n_keys, n_overflow


def bin_instances(rect, center, valid, cfg: RasterConfig, gx: int, gy: int,
                  tile_lo=None, n_tiles: int = None):
    """Materialized per-tile id lists (see _bin_sorted): ([Tl, K] gaussian
    ids, [Tl] counts, overflow count)."""
    s_key, starts, counts, shift, n_keys, n_overflow = _bin_sorted(
        rect, center, valid, cfg, gx, gy, tile_lo, n_tiles
    )
    K = cfg.tile_capacity
    idx = starts[:-1, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, n_keys - 1)
    ids = jnp.take(s_key, idx, mode="clip") & ((1 << shift) - 1)
    return ids, jnp.minimum(counts, K), n_overflow


def bin_instances_windows(rect, center, valid, cfg: RasterConfig, gx: int,
                          gy: int, tile_lo=None, n_tiles: int = None):
    """Fused-gather form: per-SLOT gaussian ids in sorted (tile, depth)
    order + per-tile [start, count) windows into that dense list.
    Returns (gid [E], starts [Tl], counts [Tl], overflow). Slots outside
    every tile's first-K window (sentinels, per-tile overflow) carry real
    gaussian rows but are never read (the kernel trip count stops at
    count) and their gradient rows are masked in the fused VJP."""
    s_key, starts, counts, shift, n_keys, n_overflow = _bin_sorted(
        rect, center, valid, cfg, gx, gy, tile_lo, n_tiles
    )
    K = cfg.tile_capacity
    gid = s_key & ((1 << shift) - 1)
    return gid, starts[:-1], jnp.minimum(counts, K), n_overflow


def _tile_pixels(H: int, W: int, cfg: RasterConfig, gx: int, gy: int, beams,
                 tiles=None):
    """Per-tile pixel coords + ray dirs. `tiles`: optional [Tl] global tile
    indices (default: all gy*gx tiles)."""
    th, tw = cfg.tile_h, cfg.tile_w
    t = (jnp.arange(gx * gy, dtype=jnp.int32) if tiles is None
         else jnp.asarray(tiles, jnp.int32))
    rows = (t // gx)[:, None] * th + jnp.arange(th, dtype=jnp.int32)[None, :]
    cols = (t % gx)[:, None] * tw + jnp.arange(tw, dtype=jnp.int32)[None, :]
    pix_y = jnp.repeat(rows, tw, axis=1)                      # [Tl, th*tw]
    pix_x = jnp.tile(cols, (1, th))
    safe_rows = jnp.minimum(pix_y, H - 1)
    dirs = pixel_rays(safe_rows, pix_x % W, beams, W)
    return pix_x, pix_y, dirs


def _pix_blocks(pix_x, pix_y, dirs):
    """[T, 8, 128] pixel blocks for the pallas kernel: rows 0-2 unit ray
    dir xyz, row 3 pixel column, row 4 pixel row (as f32), rows 5-7 zero."""
    T, npix = pix_x.shape
    rows = [
        dirs[..., 0], dirs[..., 1], dirs[..., 2],
        pix_x.astype(jnp.float32), pix_y.astype(jnp.float32),
    ]
    blk = jnp.stack(rows, axis=1)                             # [T, 5, npix]
    return jnp.pad(blk, ((0, 0), (0, 3), (0, 0)))


def _use_pallas(cfg: RasterConfig, C: int, surfel: bool = False) -> bool:
    if cfg.backend == "pallas":
        return True
    if cfg.backend == "xla":
        return False
    lanes_ok = cfg.tile_w == 128 and cfg.tile_h in (1, 2, 4, 8)
    return (
        jax.default_backend() == "tpu"
        and lanes_ok
        and C + 2 <= 8
        and cfg.tile_capacity % cfg.pallas_chunk == 0
    )


def render_packed_window(
    pkv: jnp.ndarray,            # [V, F] depth-ordered packed splats
    beams: jnp.ndarray,
    W: int,
    cfg: RasterConfig,
    C: int,
    tile_lo=None,                # traced window start (global tile index)
    n_tiles: int = None,         # static window size (default: full grid)
    tile_spec=None,
):
    """Bin + composite a window of tiles against the packed gaussian set.
    Returns per-tile strips (color [Tl,C,npix], depth, final_T, overflow) —
    the building block shared by the single-chip path (full window) and the
    shard_map multi-chip path (each device owns a contiguous window)."""
    H = beams.shape[0]
    gy, gx = cfg.grid_shape(H, W)
    Tl = gy * gx if n_tiles is None else n_tiles
    F = pkv.shape[1]
    K = cfg.tile_capacity
    vvalid = pkv[:, PackedCols.validf(C)] > 0.0
    rect = pkv[:, PackedCols.rect(C)].astype(jnp.int32)
    center = pkv[:, PackedCols.center(C)]

    lo = jnp.int32(0) if tile_lo is None else jnp.asarray(tile_lo, jnp.int32)
    tiles = lo + jnp.arange(Tl, dtype=jnp.int32)
    pix_x, pix_y, dirs = _tile_pixels(H, W, cfg, gx, gy, beams, tiles=tiles)

    if cfg.fused_gather and _use_pallas(cfg, C) and tile_spec is None:
        # fused gather: ONE dense [E, F] row gather in sorted (tile, depth)
        # order; the kernel DMAs each tile's contiguous window — no
        # [T, K, F] materialization. Gradients flow through the dense
        # gather's transpose (deterministic scatter-add), with slots
        # outside every tile's first-K window masked out.
        from .pallas_composite import composite_windows_pallas

        gid, starts, counts, n_overflow = bin_instances_windows(
            rect, center, vvalid, cfg, gx, gy, tile_lo=tile_lo, n_tiles=n_tiles
        )
        buf = jnp.take(pkv, gid, axis=0, mode="clip")
        buf = jnp.pad(buf, ((0, K), (0, 0)))
        blk = _pix_blocks(pix_x, pix_y, dirs)
        out8 = composite_windows_pallas(buf, starts, counts, blk, C, cfg)
        return out8[:, :C], out8[:, C], out8[:, C + 1], n_overflow

    ids, counts, n_overflow = bin_instances(
        rect, center, vvalid, cfg, gx, gy, tile_lo=tile_lo, n_tiles=n_tiles
    )

    # one wide row-gather materialises the per-tile instance lists; its
    # transpose (backward) is a deterministic scatter-add — the TPU analogue
    # of the reference backward's atomicAdd accumulation (backward.cu:702-788)
    inst = jnp.take(pkv, ids.reshape(-1), axis=0, mode="clip").reshape(Tl, K, F)

    if tile_spec is not None:
        from jax.sharding import PartitionSpec as _P

        wsc = jax.lax.with_sharding_constraint
        inst = wsc(inst, _P(tile_spec, None, None))
        counts = wsc(counts, _P(tile_spec))
        pix_x = wsc(pix_x, _P(tile_spec, None))
        pix_y = wsc(pix_y, _P(tile_spec, None))
        dirs = wsc(dirs, _P(tile_spec, None, None))

    if _use_pallas(cfg, C):
        from .pallas_composite import composite_tiles_pallas

        blk = _pix_blocks(pix_x, pix_y, dirs)
        out8 = composite_tiles_pallas(inst, counts, blk, C, cfg)
        color_t, depth_t, final_T_t = out8[:, :C], out8[:, C], out8[:, C + 1]
    else:
        inst_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
        out = composite_packed(inst, inst_valid, dirs, pix_x, pix_y, C, cfg)
        color_t, depth_t, final_T_t = out.color, out.depth, out.final_T
    return color_t, depth_t, final_T_t, n_overflow


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
    Tn = gy * gx
    C = splats.feat.shape[-1]
    F = PackedCols.width(C)

    # --- cull + compact + depth-presort in ONE sort ---
    # splats.depth carries a finite 4*far sentinel on invalid rows
    # (projection.py), so sorting by depth alone front-packs the valid
    # gaussians in depth order; truncation to max_visible then drops the
    # *farthest* (most-occluded) gaussians first.
    V = min(cfg.max_visible, P)
    pk = pack_splats(splats)                                    # [P, F]
    _, sel = jax.lax.sort(
        (splats.depth, jnp.arange(P, dtype=jnp.int32)), num_keys=1,
        is_stable=True
    )
    pkv = permutation_rows(pk, sel, V)                          # [V, F] wide rows
    vvalid = pkv[:, PackedCols.validf(C)] > 0.0
    n_valid_total = jnp.sum(splats.valid)
    n_dropped = n_valid_total - jnp.sum(vvalid)

    color_t, depth_t, final_T_t, n_overflow = render_packed_window(
        pkv, beams, W, cfg, C, tile_spec=tile_spec
    )

    # --- reassemble tiles into the image ---
    th, tw = cfg.tile_h, cfg.tile_w
    color = color_t.reshape(gy, gx, C, th, tw).transpose(2, 0, 3, 1, 4)
    color = color.reshape(C, gy * th, gx * tw)[:, :H, :W]
    depth = depth_t.reshape(gy, gx, th, tw).transpose(0, 2, 1, 3)
    depth = depth.reshape(gy * th, gx * tw)[:H, :W]
    final_T = final_T_t.reshape(gy, gx, th, tw).transpose(0, 2, 1, 3)
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
