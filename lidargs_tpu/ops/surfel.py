"""Surfel (2DGS) range-view rasterizer — LiDAR-GS's "2DGS version".

TPU-native re-design of the reference's second CUDA extension
(`diff_lidargs_surfel_rasterization/cuda_rasterizer/forward.cu`, 788 LoC +
backward 861 LoC). Gaussians are 2D surfels: scale in R^2 with the third
local axis as the normal. Per surfel we build T = (Tu, Tv, Tw): the two
scaled axis directions and the center, all in sensor (view) space
(`compute_transmat`, surfel forward.cu:269-295); per pixel we intersect the
laser ray with the surfel plane exactly — no local-affine approximation
(surfel forward.cu:442-473) — with a 2D low-pass fallback
`rho2d = FilterInvSquare*(40 dx^2 + 100 dy^2)` (forward.cu:469,
auxiliary.h:39) for degenerate views.

Outputs match the reference binding's `out_others[7, H, W]`
(auxiliary.h:22-28): expected depth, accumulated alpha, normal (3), median
depth, and the 2DGS distortion-loss accumulator (forward.cu:495-543).

Backward: on the pallas path, the hand-derived single-pass kernel
(pallas_surfel._bwd_kernel, covering the reference's 861-line backward.cu);
on the XLA path (and as the test oracle), JAX autodiff through the
rematerialized chunk scan. The binning/sort infrastructure is shared with
the beam-splatting variant (rasterize.py), including the fused-gather
windowed-DMA mode (cfg.fused_gather).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from .composite import pixel_rays
from .projection import _project_rows, quat_to_rotmat
from .rasterize import bin_instances, permutation_rows, _tile_pixels


class SurfelCols:
    """Packed per-surfel column layout [P, F] (analogue of PackedCols)."""

    TU = slice(0, 3)          # view-space axis-u direction * scale_u
    TV = slice(3, 6)          # view-space axis-v direction * scale_v
    TW = slice(6, 9)          # view-space center
    NORMAL = slice(9, 12)     # view-space unit normal (dual-visibility flipped)
    OPACITY = 12
    DEPTH = 13                # euclidean center range (sort key)
    FEAT0 = 14

    @staticmethod
    def center(C: int) -> slice:
        return slice(14 + C, 16 + C)

    @staticmethod
    def rect(C: int) -> slice:
        return slice(16 + C, 20 + C)

    @staticmethod
    def validf(C: int) -> int:
        return 20 + C

    @staticmethod
    def width(C: int) -> int:
        return -(-(21 + C) // 8) * 8


def _pix_f(p: jnp.ndarray, beams: jnp.ndarray, W: int):
    """cpmpute_pix_f (surfel forward.cu:120-144): view-space point ->
    (col, row) image coords, row flipped, NO divergence rejection."""
    H = beams.shape[0]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    horiz2 = x * x + y * y
    safe = horiz2 > 0.0
    xs = jnp.where(safe, x, 1.0)
    beta = jnp.pi - jnp.arctan2(y, xs)
    p_c = beta / (2.0 * jnp.pi / W)
    alpha_el = jnp.arctan2(z, jnp.sqrt(jnp.where(safe, horiz2, 1.0)))
    row, _, _ = _project_rows(alpha_el, beams, 0.0, margin=0.0)
    return p_c, H - row - 1.0, safe


def preprocess_surfels(
    means3d: jnp.ndarray,     # [P,3] world
    scales2: jnp.ndarray,     # [P,2] surfel scales (activated)
    quats: jnp.ndarray,       # [P,4] normalized (r,x,y,z)
    opacities: jnp.ndarray,   # [P]
    feat: jnp.ndarray,        # [P,C]
    mask: jnp.ndarray,        # [P] upstream validity
    w2s_rot: jnp.ndarray,     # [3,3]
    w2s_trans: jnp.ndarray,   # [3]
    beams: jnp.ndarray,       # [H]
    W: int,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Per-surfel preprocess (preprocessCUDA_cylinder, surfel
    forward.cu:221-330) -> packed [P, F] rows (SurfelCols)."""
    H = beams.shape[0]
    P = means3d.shape[0]
    C = feat.shape[-1]
    rda = cfg.surfel_ray_divergence_angle

    hi = jax.lax.Precision.HIGHEST
    e_x = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    tw_raw = jnp.matmul(means3d, w2s_rot.T, precision=hi) + w2s_trans   # [P,3]
    sq = jnp.sum(tw_raw * tw_raw, axis=-1)
    mask = mask & (sq > 0.0)
    tw = jnp.where(mask[:, None], tw_raw, e_x)
    dist = jnp.sqrt(jnp.sum(tw * tw, axis=-1))
    valid = mask & (dist < cfg.far) & (dist > cfg.near)

    # center pixel with 1x ray-divergence rejection (cpmpute_pix,
    # surfel forward.cu:145-174)
    horiz2 = tw[:, 0] ** 2 + tw[:, 1] ** 2
    degenerate = horiz2 <= 0.0
    valid = valid & ~degenerate
    tflat = jnp.where(degenerate[:, None], e_x, tw)
    beta = jnp.pi - jnp.arctan2(tflat[:, 1], tflat[:, 0])
    p_c = beta / (2.0 * jnp.pi / W)
    alpha_el = jnp.arctan2(tflat[:, 2], jnp.sqrt(jnp.where(degenerate, 1.0, horiz2)))
    row, _, row_ok = _project_rows(alpha_el, beams, rda, margin=1.0)
    valid = valid & row_ok
    p_r = H - row - 1.0

    # T = (Tu, Tv, Tw) in view space (compute_transmat semantics:
    # Tu/Tv are the scaled local axes rotated into the sensor frame)
    R = quat_to_rotmat(quats)                                   # [P,3,3]
    ax_u = R[..., :, 0] * scales2[:, :1]
    ax_v = R[..., :, 1] * scales2[:, 1:2]
    n_world = R[..., :, 2]
    tu = jnp.matmul(ax_u, w2s_rot.T, precision=hi)
    tv = jnp.matmul(ax_v, w2s_rot.T, precision=hi)
    normal = jnp.matmul(n_world, w2s_rot.T, precision=hi)

    # DUAL_VISIABLE flip (surfel forward.cu:297-302): orient the normal
    # toward the sensor; cull exactly edge-on surfels
    cosv = -jnp.sum(tw * normal, axis=-1)
    valid = valid & (cosv != 0.0)
    normal = normal * jnp.where(cosv > 0, 1.0, -1.0)[:, None]

    # AABB from +-3 sigma axis endpoints through the range-view mapping
    # (compute_aabb_cylinder, surfel forward.cu:177-215)
    cutoff = 3.0
    ext_x = jnp.zeros((P,), jnp.float32)
    ext_y = jnp.zeros((P,), jnp.float32)
    for axis in (tu, tv):
        for sgn in (1.0, -1.0):
            end = tw + sgn * cutoff * axis
            ex, ey, _ = _pix_f(end, beams, W)
            ext_x = jnp.maximum(ext_x, jnp.abs(ex - p_c))
            ext_y = jnp.maximum(ext_y, jnp.abs(ey - p_r))
    r_x = jnp.ceil(jnp.maximum(ext_x, 1.0))
    r_y = jnp.ceil(jnp.maximum(ext_y, 1.0))

    # getRect_lidar, surfel auxiliary.h:99-112 (BLOCK 16x1; y-max uses a
    # bare round(p_r + r_y) — the reference's quirkier variant)
    bx = cfg.ref_block_x
    grid_x = -(-W // bx)
    rmin_x = jnp.clip(jnp.floor((p_c - r_x) / bx), 0, grid_x)
    rmax_x = jnp.clip(jnp.floor((p_c + r_x + bx - 1) / bx), 0, grid_x)
    rmin_y = jnp.clip(jnp.floor(p_r - r_y), 0, H)
    rmax_y = jnp.clip(jnp.floor(p_r + r_y + 0.5), 0, H)
    valid = valid & ((rmax_x - rmin_x) * (rmax_y - rmin_y) > 0)

    rect = jnp.stack([rmin_x * bx, rmax_x * bx, rmin_y, rmax_y], -1)

    depth_sentinel = 4.0 * cfg.far
    vf = valid.astype(jnp.float32)
    cols = [
        tu, tv, tw,
        normal,
        jnp.where(valid, opacities, 0.0)[:, None],
        jnp.where(valid, dist, depth_sentinel)[:, None],
        feat.astype(jnp.float32),
        jnp.stack([p_c, p_r], -1),
        rect,
        vf[:, None],
    ]
    pk = jnp.concatenate(cols, axis=1).astype(jnp.float32)
    pad = SurfelCols.width(C) - pk.shape[1]
    if pad:
        pk = jnp.pad(pk, ((0, 0), (0, pad)))
    return pk


class SurfelOut(NamedTuple):
    color: jnp.ndarray        # [C, H, W] (bg blended)
    depth: jnp.ndarray        # [H, W] expected depth
    occ: jnp.ndarray          # [H, W] 1 - final_T
    final_T: jnp.ndarray      # [H, W]
    normal: jnp.ndarray       # [3, H, W]
    median_depth: jnp.ndarray # [H, W]
    distortion: jnp.ndarray   # [H, W] 2DGS distortion accumulator
    visible: jnp.ndarray      # [P]
    n_dropped: jnp.ndarray
    n_overflow: jnp.ndarray


def _surfel_chunk(carry, chunk, pix_dir, pix_x, pix_y, C, cfg: RasterConfig):
    """One [L, K, F] chunk against [L, npix] pixels: the exact per-pixel
    semantics of the surfel renderCUDA walk (surfel forward.cu:415-543) in
    prefix-product form."""
    inst, inst_valid = chunk
    T, done, color, depth_acc, nrm_acc, m1, m2, dist_acc, med = carry
    S = SurfelCols
    g3 = lambda sl: inst[..., sl]                       # [L,K,3]
    tu, tv, tw = g3(S.TU), g3(S.TV), g3(S.TW)
    nrm = g3(S.NORMAL)
    opa = inst[..., S.OPACITY]
    feat = inst[..., S.FEAT0 : S.FEAT0 + C]
    cen = inst[..., S.center(C)]
    rect = inst[..., S.rect(C)]
    valid = inst_valid & (inst[..., S.validf(C)] > 0.0)

    p = pix_dir[:, None]                                # [L,1,npix,3]
    rho_r = jnp.sqrt(jnp.maximum(jnp.sum(tw * tw, -1), 1e-20))   # [L,K]
    # ray-plane intersection: lambda2 = (Tw . n) / (p . n)
    lam = jnp.sum(tw * nrm, -1)                          # [L,K]
    cos2 = jnp.sum(p * nrm[:, :, None], -1)              # [L,K,npix]
    hit = cos2 != 0.0
    cos2s = jnp.where(hit, cos2, 1.0)
    lam2 = lam[..., None] / cos2s                        # [L,K,npix]
    real_p = lam2[..., None] * p                         # [L,K,npix,3]
    dp = real_p - tw[:, :, None]
    tu_tu = jnp.maximum(jnp.sum(tu * tu, -1), 1e-20)
    tv_tv = jnp.maximum(jnp.sum(tv * tv, -1), 1e-20)
    sx = jnp.sum(dp * tu[:, :, None], -1) / tu_tu[..., None]
    sy = jnp.sum(dp * tv[:, :, None], -1) / tv_tv[..., None]
    rho3d = sx * sx + sy * sy

    dx = cen[..., 0:1] - pix_x[:, None].astype(jnp.float32)
    dy = cen[..., 1:2] - pix_y[:, None].astype(jnp.float32)
    rho2d = cfg.filter_inv_square * (40.0 * dx * dx + 100.0 * dy * dy)

    pos = hit & (lam2 > 0.0)
    use3d = pos & (rho3d <= rho2d)
    rho = jnp.where(pos, jnp.minimum(rho3d, rho2d), rho2d)
    depth = jnp.where(use3d, lam2, rho_r[..., None])

    power = -0.5 * rho
    alpha = jnp.minimum(cfg.alpha_clamp, opa[..., None] * jnp.exp(power))
    # parity-rect mask: the CUDA walk has no per-pixel support test — a
    # surfel reaches exactly the pixels of the 16x1 tiles its AABB touches
    # (getRect_lidar). Masking on the same rect in pixel units makes the
    # result independent of OUR physical tile shape.
    pxf = pix_x[:, None].astype(jnp.float32)
    pyf = pix_y[:, None].astype(jnp.float32)
    in_rect = (
        (pxf >= rect[..., 0:1]) & (pxf < rect[..., 1:2])
        & (pyf >= rect[..., 2:3]) & (pyf < rect[..., 3:4])
    )
    pass_ = (
        valid[..., None]
        & in_rect
        & hit
        & (depth >= cfg.surfel_near)
        & (power <= 0.0)
        & (alpha >= cfg.alpha_min)
    )

    a_eff = jnp.where(pass_, alpha, 0.0)
    one_m = 1.0 - a_eff
    prefix = jnp.concatenate(
        [jnp.ones_like(one_m[:, :1]), jnp.cumprod(one_m, axis=1)[:, :-1]], axis=1
    )
    P = T[:, None] * prefix
    crossing = pass_ & (P * (1.0 - alpha) < cfg.transmittance_min)
    dead = jnp.cumsum(crossing.astype(jnp.int32), axis=1) > 0
    applied = pass_ & ~dead & ~done[:, None]
    w = jnp.where(applied, alpha * P, 0.0)                # [L,K,npix]

    color = color + jnp.einsum(
        "lkp,lkc->lcp", w, feat, precision=jax.lax.Precision.HIGHEST
    )
    depth_acc = depth_acc + jnp.sum(w * depth, axis=1)
    nrm_acc = nrm_acc + jnp.einsum(
        "lkp,lkc->lcp", w, nrm, precision=jax.lax.Precision.HIGHEST
    )

    # distortion loss accumulator (surfel forward.cu:495-516): per instance
    # uses the RUNNING M1/M2 and A=1-T *before* this instance
    fn, nn = cfg.surfel_far, cfg.surfel_near
    m = fn / (fn - nn) * (1.0 - nn / jnp.maximum(depth, 1e-9))
    wm = w * m
    wm2 = w * m * m
    m1_pre = m1[:, None] + jnp.concatenate(
        [jnp.zeros_like(wm[:, :1]), jnp.cumsum(wm, axis=1)[:, :-1]], axis=1
    )
    m2_pre = m2[:, None] + jnp.concatenate(
        [jnp.zeros_like(wm2[:, :1]), jnp.cumsum(wm2, axis=1)[:, :-1]], axis=1
    )
    A = 1.0 - P
    dist_acc = dist_acc + jnp.sum(
        w * (m * m * A + m2_pre - 2.0 * m * m1_pre), axis=1
    )
    m1 = m1 + jnp.sum(wm, axis=1)
    m2 = m2 + jnp.sum(wm2, axis=1)

    # median depth: depth of the LAST applied instance with pre-T > 0.5
    # (surfel forward.cu:517-521)
    cand = applied & (P > 0.5)
    K = w.shape[1]
    idx = jnp.arange(K, dtype=jnp.int32)[None, :, None]
    last = jnp.max(jnp.where(cand, idx, -1), axis=1)      # [L,npix]
    sel = cand & (idx == last[:, None])
    med = jnp.where(jnp.any(cand, axis=1), jnp.sum(jnp.where(sel, depth, 0.0), axis=1), med)

    T = T * jnp.prod(jnp.where(applied, 1.0 - alpha, 1.0), axis=1)
    done = done | jnp.any(crossing & ~done[:, None], axis=1)
    return (T, done, color, depth_acc, nrm_acc, m1, m2, dist_acc, med)


def surfel_composite(
    inst: jnp.ndarray,        # [L, K_total, F]
    inst_valid: jnp.ndarray,  # [L, K_total]
    pix_dir: jnp.ndarray,     # [L, npix, 3]
    pix_x: jnp.ndarray,       # [L, npix]
    pix_y: jnp.ndarray,       # [L, npix]
    C: int,
    cfg: RasterConfig,
):
    L, K_total, F = inst.shape
    npix = pix_x.shape[1]
    K = min(cfg.chunk, K_total)
    n_chunks = -(-K_total // K)
    pad = n_chunks * K - K_total
    if pad:
        inst = jnp.pad(inst, ((0, 0), (0, pad), (0, 0)))
        inst_valid = jnp.pad(inst_valid, ((0, 0), (0, pad)))
    inst_c = inst.reshape(L, n_chunks, K, F).transpose(1, 0, 2, 3)
    valid_c = inst_valid.reshape(L, n_chunks, K).transpose(1, 0, 2)

    z = lambda *s: jnp.zeros(s, jnp.float32)
    init = (
        jnp.ones((L, npix), jnp.float32),        # T
        jnp.zeros((L, npix), jnp.bool_),         # done
        z(L, C, npix), z(L, npix),               # color, depth
        z(L, 3, npix), z(L, npix), z(L, npix),   # normal, M1, M2
        z(L, npix), z(L, npix),                  # distortion, median
    )

    @jax.checkpoint
    def step(carry, ch):
        return _surfel_chunk(carry, ch, pix_dir, pix_x, pix_y, C, cfg), None

    carry, _ = jax.lax.scan(step, init, (inst_c, valid_c))
    return carry


def render_surfels(
    pk: jnp.ndarray,          # [P, F] packed surfels (preprocess_surfels)
    beams: jnp.ndarray,
    W: int,
    bg: jnp.ndarray,
    cfg: RasterConfig,
    C: int = 2,
    golden: bool = False,
) -> SurfelOut:
    """Tiled surfel render (golden=True: single whole-image list, the test
    oracle). Shares binning with the beam-splatting variant."""
    H = beams.shape[0]
    P = pk.shape[0]
    S = SurfelCols
    depth = pk[:, S.DEPTH]
    valid_all = pk[:, S.validf(C)] > 0.0

    V = min(cfg.max_visible, P)
    _, sel = jax.lax.sort(
        (depth, jnp.arange(P, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    # gather-based VJP: the scatter-add transpose of this row-take was the
    # largest non-kernel backward term (see rasterize.permutation_rows)
    pkv = permutation_rows(pk, sel, V)
    vvalid = pkv[:, S.validf(C)] > 0.0
    n_dropped = jnp.sum(valid_all) - jnp.sum(vvalid)

    if golden:
        Tn, K = 1, V
        ids = jnp.arange(V, dtype=jnp.int32)[None]
        counts = jnp.sum(vvalid).astype(jnp.int32)[None]
        n_overflow = jnp.zeros((), jnp.int32)
        rows = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)[None]
        cols = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)[None]
        dirs = pixel_rays(rows[0], cols[0], beams, W)[None]
        pix_x, pix_y = cols, rows
        gy, gx, th, tw = 1, 1, H, W
    else:
        gy, gx = cfg.grid_shape(H, W)
        Tn = gy * gx
        rect = pkv[:, S.rect(C)].astype(jnp.int32)
        center = pkv[:, S.center(C)]
        K = cfg.tile_capacity
        pix_x, pix_y, dirs = _tile_pixels(H, W, cfg, gx, gy, beams)
        th, tw = cfg.tile_h, cfg.tile_w

    F = pkv.shape[1]

    from .rasterize import _pix_blocks, _use_pallas

    use_pal = not golden and _use_pallas(cfg, C, surfel=True)
    if use_pal and cfg.fused_gather:
        # fused gather (see rasterize.py): one dense sorted-instance buffer,
        # per-tile windowed DMA in the kernel instead of a [T, K, F] gather
        from .pallas_surfel import surfel_composite_windows
        from .rasterize import bin_instances_windows

        gid, starts, counts, n_overflow = bin_instances_windows(
            rect, center, vvalid, cfg, gx, gy
        )
        buf = jnp.take(pkv, gid, axis=0, mode="clip")
        buf = jnp.pad(buf, ((0, K), (0, 0)))
        blk = _pix_blocks(pix_x, pix_y, dirs)
        out16 = surfel_composite_windows(buf, starts, counts, blk, C, cfg)
    else:
        if not golden:
            ids, counts, n_overflow = bin_instances(
                rect, center, vvalid, cfg, gx, gy
            )
        inst = jnp.take(pkv, ids.reshape(-1), axis=0, mode="clip").reshape(Tn, K, F)
        if use_pal:
            from .pallas_surfel import surfel_composite_tiles

            blk = _pix_blocks(pix_x, pix_y, dirs)
            out16 = surfel_composite_tiles(inst, counts, blk, C, cfg)
        else:
            inst_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
            (T, _done, color, dep, nrm, _m1, _m2, dist, med) = surfel_composite(
                inst, inst_valid, dirs, pix_x, pix_y, C, cfg
            )
            out16 = None
    if out16 is not None:
        color = out16[:, :C]
        dep = out16[:, C]
        T = out16[:, C + 1]
        nrm = out16[:, C + 2 : C + 5]
        med = out16[:, C + 5]
        dist = out16[:, C + 6]

    def asm1(x):  # [Tn, npix] -> [H, W]
        return x.reshape(gy, gx, th, tw).transpose(0, 2, 1, 3).reshape(
            gy * th, gx * tw
        )[:H, :W]

    def asmC(x):  # [Tn, c, npix] -> [c, H, W]
        c = x.shape[1]
        return x.reshape(gy, gx, c, th, tw).transpose(2, 0, 3, 1, 4).reshape(
            c, gy * th, gx * tw
        )[:, :H, :W]

    final_T = asm1(T)
    color = asmC(color) + final_T[None] * bg[:, None, None]
    return SurfelOut(
        color=color,
        depth=asm1(dep),
        occ=1.0 - final_T,
        final_T=final_T,
        normal=asmC(nrm),
        median_depth=asm1(med),
        distortion=asm1(dist),
        visible=valid_all,
        n_dropped=n_dropped,
        n_overflow=n_overflow,
    )
