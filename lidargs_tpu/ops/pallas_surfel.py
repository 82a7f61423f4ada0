"""Pallas TPU forward kernel for the surfel (2DGS) variant.

Same tile/lane layout as the beam-splatting kernel (pallas_composite.py):
tile_h x 128 tiles (NPIX = tile_h*128 lanes per op), instance chunks on sublanes, prefix-product transmittance with
per-tile dynamic trip counts and transmittance early exit. Implements the
exact per-pixel semantics of the surfel renderCUDA walk (surfel
forward.cu:415-543): ray-plane intersection depth, rho2d low-pass fallback,
and the auxiliary accumulators (normal, median depth, 2DGS distortion).

Backward: a hand-derived single forward-order Pallas pass (same carry
structure as the beam _bwd_kernel) covering the reference's 861-line CUDA
backward (surfel backward.cu:370-692): the ray-plane intersection chain
(dλ2/dTw, dλ2/dnormal), the rho2d low-pass fallback, and the distortion
accumulator. The distortion gradients collapse to closed forms that keep
the pass single-traversal:

  * d dist / d m_k     = 2 w_k (m_k · Wtot − M1tot)          (all-pairs form)
  * d dist / d w_k|ind = ψ_k + S_k  with  S_k the "pairs behind k" sum,
    computable from the running prefixes + the saved M1/M2 totals;
  * the suffix Σ_{i>k} w_i (ψ_i + S_i) needs Σ_i w_i S_i — which equals
    dist itself (both enumerate the pairwise w_i w_j (m_i − m_j)^2 sum),
    so no extra total has to be saved.

The machine-derived VJP of the XLA chunk scan (ops/surfel.py) remains as
the test oracle (_xla_rows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RasterConfig
from .pallas_composite import _chunk_weights, _cumsum
from .surfel import SurfelCols as S

OUT_ROWS = 16  # C color, depth, final_T, normal(3), median, distortion


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _surfel_alpha(s, pix, count, base_row, ch, C, cfg: RasterConfig):
    """[CH, F] chunk -> (alpha, passed, depth, m, feat cols, normal cols,
    row indices, geometry-intermediates dict for the backward pass).
    Mirrors ops/surfel.py _surfel_chunk / surfel forward.cu:415-492."""
    dirx, diry, dirz, px, py = pix
    col = lambda i: s[:, i : i + 1]
    twx, twy, twz = col(6), col(7), col(8)
    nx, ny, nz = col(9), col(10), col(11)
    tux, tuy, tuz = col(0), col(1), col(2)
    tvx, tvy, tvz = col(3), col(4), col(5)
    op = col(S.OPACITY)
    rect0 = S.rect(C).start
    cenx = col(S.center(C).start)
    ceny = col(S.center(C).start + 1)
    x0, x1 = col(rect0), col(rect0 + 1)
    y0, y1 = col(rect0 + 2), col(rect0 + 3)
    validf = col(S.validf(C))

    tw_sq = twx * twx + twy * twy + twz * twz
    rho_r = jnp.sqrt(jnp.maximum(tw_sq, 1e-20))
    lam = twx * nx + twy * ny + twz * nz                       # [CH, 1]
    cos2 = nx * dirx + ny * diry + nz * dirz                   # [CH, NPIX]
    hit = cos2 != 0.0
    cos2s = jnp.where(hit, cos2, 1.0)
    lam2 = lam / cos2s
    dpx = lam2 * dirx - twx
    dpy = lam2 * diry - twy
    dpz = lam2 * dirz - twz
    tu_sq = tux * tux + tuy * tuy + tuz * tuz
    tv_sq = tvx * tvx + tvy * tvy + tvz * tvz
    tu_tu = jnp.maximum(tu_sq, 1e-20)
    tv_tv = jnp.maximum(tv_sq, 1e-20)
    sx = (dpx * tux + dpy * tuy + dpz * tuz) / tu_tu
    sy = (dpx * tvx + dpy * tvy + dpz * tvz) / tv_tv
    rho3d = sx * sx + sy * sy

    dxc = cenx - px
    dyc = ceny - py
    rho2d = cfg.filter_inv_square * (40.0 * dxc * dxc + 100.0 * dyc * dyc)

    pos = hit & (lam2 > 0.0)
    use3d = pos & (rho3d <= rho2d)
    rho = jnp.where(pos, jnp.minimum(rho3d, rho2d), rho2d)
    depth = jnp.where(use3d, lam2, rho_r)

    e = jnp.exp(-0.5 * rho)
    araw = op * e
    alpha = jnp.minimum(cfg.alpha_clamp, araw)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ch, dirx.shape[-1]), 0) + base_row
    passed = (
        (rowi < count)
        & (validf > 0.0)
        & (px >= x0) & (px < x1) & (py >= y0) & (py < y1)
        & hit
        & (depth >= cfg.surfel_near)
        & (alpha >= cfg.alpha_min)
    )
    fn, nn = cfg.surfel_far, cfg.surfel_near
    m = fn / (fn - nn) * (1.0 - nn / jnp.maximum(depth, 1e-9))
    feat = [col(S.FEAT0 + c) for c in range(C)]
    gm = dict(
        tw=(twx, twy, twz), n=(nx, ny, nz), tu=(tux, tuy, tuz),
        tv=(tvx, tvy, tvz), op=op,
        tw_sq=tw_sq, rho_r=rho_r, lam2=lam2, cos2s=cos2s, hit=hit,
        dp=(dpx, dpy, dpz), tu_sq=tu_sq, tv_sq=tv_sq,
        tu_tu=tu_tu, tv_tv=tv_tv, sx=sx, sy=sy,
        dxc=dxc, dyc=dyc, use3d=use3d, e=e, araw=araw,
    )
    return alpha, passed, depth, m, feat, (nx, ny, nz), rowi, gm


def _fwd_tile(read, count, pixb, out_ref, *, C, CH, cfg):
    """Shared forward tile walk; `read(i)` yields the i-th [CH, F] chunk."""
    pix = (pixb[0:1], pixb[1:2], pixb[2:3], pixb[3:4], pixb[4:5])
    NP = pixb.shape[-1]
    nch = pl.cdiv(count, CH)

    def cond(st):
        return (st[0] < nch) & (jnp.min(st[2]) < 0.5)

    def body(st):
        (i, T, done, cacc, dacc, nacc, m1, m2, dist, med) = st
        s = read(i)
        alpha, passed, depth, m, feat, nrm, rowi, _gm = _surfel_alpha(
            s, pix, count, i * CH, CH, C, cfg
        )
        w, applied, P, T_new, done_new = _chunk_weights(
            alpha, passed, T, done, cfg, CH
        )

        cacc = cacc + jnp.concatenate(
            [jnp.sum(w * feat[c], axis=0, keepdims=True) for c in range(C)], 0
        )
        dacc = dacc + jnp.sum(w * depth, axis=0, keepdims=True)
        nacc = nacc + jnp.concatenate(
            [jnp.sum(w * nrm[k], axis=0, keepdims=True) for k in range(3)], 0
        )

        # distortion (surfel forward.cu:495-516): uses RUNNING M1/M2 and
        # A = 1 - T-before-this-instance = 1 - P
        wm = w * m
        wm2 = wm * m
        z1 = jnp.zeros((1, NP), jnp.float32)
        m1_pre = m1 + jnp.concatenate([z1, _cumsum(wm, CH)[: CH - 1]], 0)
        m2_pre = m2 + jnp.concatenate([z1, _cumsum(wm2, CH)[: CH - 1]], 0)
        A = 1.0 - P
        dist = dist + jnp.sum(w * (m * m * A + m2_pre - 2.0 * m * m1_pre),
                              axis=0, keepdims=True)
        m1 = m1 + jnp.sum(wm, axis=0, keepdims=True)
        m2 = m2 + jnp.sum(wm2, axis=0, keepdims=True)

        # median depth: LAST applied instance with pre-T > 0.5
        cand = applied & (P > 0.5)
        last = jnp.max(jnp.where(cand, rowi, -1), axis=0, keepdims=True)
        sel = cand & (rowi == last)
        med = jnp.where(
            jnp.max(jnp.where(cand, 1.0, 0.0), axis=0, keepdims=True) > 0,
            jnp.sum(jnp.where(sel, depth, 0.0), axis=0, keepdims=True),
            med,
        )
        return (i + 1, T_new, done_new, cacc, dacc, nacc, m1, m2, dist, med)

    z = lambda r: jnp.zeros((r, NP), jnp.float32)
    init = (
        jnp.zeros((), jnp.int32), jnp.ones((1, NP), jnp.float32), z(1),
        z(C), z(1), z(3), z(1), z(1), z(1), z(1),
    )
    (_, T, _d, cacc, dacc, nacc, m1, m2, dist, med) = jax.lax.while_loop(
        cond, body, init
    )
    # rows C+7/C+8 carry the M1/M2 totals — the backward pass turns its
    # "pairs behind k" distortion sums into prefix arithmetic against them
    out_ref[0] = jnp.concatenate(
        [cacc, dacc, T, nacc, med, dist, m1, m2,
         jnp.zeros((OUT_ROWS - C - 9, NP), jnp.float32)], 0
    )


def _fwd_kernel(counts_ref, inst_ref, pix_ref, out_ref, *, C, CH, cfg):
    count = counts_ref[pl.program_id(0)]
    read = lambda i: inst_ref[0, pl.ds(i * CH, CH), :]
    _fwd_tile(read, count, pix_ref[0], out_ref, C=C, CH=CH, cfg=cfg)


def _fwd_kernel_fused(starts_ref, counts_ref, pix_ref, buf_ref, out_ref,
                      scr, sem, *, C, CH, K, cfg):
    """Fused-gather surfel forward: double-buffered window DMA from the
    dense sorted instance buffer (see pallas_composite._fwd_kernel_fused)."""
    from .pallas_composite import _fused_window_dma

    t = pl.program_id(0)
    nT = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)
    count = counts_ref[t]

    @pl.when(t == 0)
    def _():
        _fused_window_dma(buf_ref, starts_ref, scr, sem, 0, 0, K).start()

    @pl.when(t + 1 < nT)
    def _():
        _fused_window_dma(
            buf_ref, starts_ref, scr, sem, t + 1, jax.lax.rem(t + 1, 2), K
        ).start()

    _fused_window_dma(buf_ref, starts_ref, scr, sem, t, slot, K).wait()
    read = lambda i: scr[slot, pl.ds(i * CH, CH), :]
    _fwd_tile(read, count, pix_ref[0], out_ref, C=C, CH=CH, cfg=cfg)


def _bwd_tile(read, write, count, pixb, res, g, *, C, CH, F, cfg):
    """Hand-derived surfel backward — single forward-order pass (the surfel
    analogue of pallas_composite._bwd_tile, covering surfel
    backward.cu:370-692). The chunk-entry transmittance is the running
    carry; every "what's behind" term is `saved total − running prefix`.

    Distortion chain (forward: dist = Σ_i w_i ψ_i with
    ψ_i = m_i²A_i + M2pre_i − 2 m_i M1pre_i, an ordered-pairs sum
    Σ_{j<i} w_i w_j (m_i−m_j)²):

      ∂dist/∂w_k (w's independent) = ψ_k + S_k,
        S_k = Σ_{i>k} w_i (m_i−m_k)²
            = m_k²·W_after + M2after − 2 m_k M1after     (prefix + totals)
      ∂dist/∂m_k = 2 w_k (m_k·Wtot − M1tot)              (all-pairs collapse)
      Σ_i w_i S_i = dist itself (same pairwise sum), so the suffix
        Σ_{i>k} w_i (ψ_i + S_i) = (dist − ΣD_incl) + (dist − ΣQ_incl).

    Median depth: the forward selects the last applied instance with
    P > 0.5 (a boolean select, like the oracle's jnp.where) — its cotangent
    routes to that instance's depth, matched here by depth == saved median.
    """
    pix = (pixb[0:1], pixb[1:2], pixb[2:3], pixb[3:4], pixb[4:5])
    NP = pixb.shape[-1]
    totc = res[0:C]
    totd = res[C : C + 1]
    Tfin = res[C + 1 : C + 2]
    totn = res[C + 2 : C + 5]
    med = res[C + 5 : C + 6]
    totdist = res[C + 6 : C + 7]
    totm1 = res[C + 7 : C + 8]
    totm2 = res[C + 8 : C + 9]
    gc = g[0:C]
    gd = g[C : C + 1]
    gT = g[C + 1 : C + 2]
    gn = g[C + 2 : C + 5]
    gmed = g[C + 5 : C + 6]
    gdist = g[C + 6 : C + 7]
    gm1 = g[C + 7 : C + 8]
    gm2 = g[C + 8 : C + 9]
    Wtot = 1.0 - Tfin
    dirx, diry, dirz = pix[0], pix[1], pix[2]
    # every suffix term is linear in its cumsum (sum_x g_x (tot_x − A_x −
    # incl(w·x)) = TOT − ACCw − incl(w·direct), with the distortion chain's
    # dist_after + q_after contributing 2·totdist and w·(ψ+S) — exactly the
    # gdist part of `direct`), so `behind` needs ONE fused prefix scan per
    # chunk instead of nine; only the VALUE prefixes m1pre/m2pre (needed by
    # ψ and S themselves) keep their own carries.
    TOT = (jnp.sum(gc * totc, axis=0, keepdims=True) + gd * totd
           + jnp.sum(gn * totn, axis=0, keepdims=True)
           + gdist * 2.0 * totdist + gm1 * totm1 + gm2 * totm2)

    nch = pl.cdiv(count, CH)

    def cond(st):
        return (st[0] < nch) & (jnp.min(st[2]) < 0.5)

    def body(st):
        (i, T, done, ACCw, Am1, Am2) = st
        s = read(i)
        alpha, passed, depth, m, feat, nrm, rowi, gme = _surfel_alpha(
            s, pix, count, i * CH, CH, C, cfg
        )
        w, applied, P, T_new, done_new = _chunk_weights(
            alpha, passed, T, done, cfg, CH
        )
        Z = jnp.zeros((CH, NP), jnp.float32)

        wm = w * m
        wm2 = wm * m

        excl = lambda x: jnp.concatenate(
            [jnp.zeros((1, NP), jnp.float32), _cumsum(x, CH)[: CH - 1]], 0
        )
        m1pre = Am1 + excl(wm)
        m2pre = Am2 + excl(wm2)
        Apre = 1.0 - P                       # Σ_{j<k} w_j (applied prefix)
        psi = m * m * Apre + m2pre - 2.0 * m * m1pre
        Wafter = P - w - Tfin                # Wtot − Apre − w
        m1after = totm1 - m1pre - wm
        m2after = totm2 - m2pre - wm2
        Sk = m * m * Wafter - 2.0 * m * m1after + m2after

        direct = (
            sum(gc[c : c + 1] * feat[c] for c in range(C))
            + gd * depth
            + sum(gn[k : k + 1] * nrm[k] for k in range(3))
            + gdist * (psi + Sk)
            + gm1 * m + gm2 * m * m
        )
        wdir = w * direct
        behind = TOT - ACCw - _cumsum(wdir, CH)
        inv1m = 1.0 / (1.0 - alpha)
        dalpha = P * direct - inv1m * (behind + gT * Tfin)
        live = applied & (gme["araw"] <= cfg.alpha_clamp)
        dalpha = jnp.where(live, dalpha, Z)

        # --- value (w-weighted) chains: m, depth, median ---
        d_m = gdist * 2.0 * w * (m * Wtot - totm1) + gm1 * w + gm2 * 2.0 * wm
        cand = applied & (P > 0.5)
        med_sel = cand & (depth == med)
        fn_, nn_ = cfg.surfel_far, cfg.surfel_near
        dm_ddep = jnp.where(
            depth > 1e-9, fn_ / (fn_ - nn_) * nn_ / (depth * depth), 0.0
        )
        d_dep = gd * w + d_m * dm_ddep + jnp.where(med_sel, gmed, Z)

        # --- alpha chain: alpha = min(clamp, op·e), e = exp(−ρ/2) ---
        dop_pix = dalpha * gme["e"]
        drho = -0.5 * dalpha * gme["araw"]
        use3d = gme["use3d"]
        drho3d = jnp.where(use3d, drho, Z)
        drho2d = jnp.where(use3d, Z, drho)

        # ρ2d = FIS·(40 dxc² + 100 dyc²), dxc = cen_x − px
        fis = cfg.filter_inv_square
        d_cenx = jnp.sum(fis * 80.0 * gme["dxc"] * drho2d, 1, keepdims=True)
        d_ceny = jnp.sum(fis * 200.0 * gme["dyc"] * drho2d, 1, keepdims=True)

        # ρ3d = sx² + sy², sx = (dp·Tu)/max(|Tu|²,ε) (quotient rule; the
        # radial term dies where the ε-clamp is active, like autodiff of max)
        sx, sy = gme["sx"], gme["sy"]
        dsx = 2.0 * sx * drho3d
        dsy = 2.0 * sy * drho3d
        dp, tu, tv = gme["dp"], gme["tu"], gme["tv"]
        twv, nv = gme["tw"], gme["n"]
        tu_tu, tv_tv = gme["tu_tu"], gme["tv_tv"]
        no_clip_u = (gme["tu_sq"] > 1e-20).astype(jnp.float32)
        no_clip_v = (gme["tv_sq"] > 1e-20).astype(jnp.float32)
        ddp = [dsx * tu[a] / tu_tu + dsy * tv[a] / tv_tv for a in range(3)]
        d_tu = [
            jnp.sum(dsx * (dp[a] - no_clip_u * 2.0 * sx * tu[a]) / tu_tu,
                    1, keepdims=True)
            for a in range(3)
        ]
        d_tv = [
            jnp.sum(dsy * (dp[a] - no_clip_v * 2.0 * sy * tv[a]) / tv_tv,
                    1, keepdims=True)
            for a in range(3)
        ]

        # depth = use3d ? λ2 : ρ_r;  dp = λ2·dir − Tw;  λ2 = (Tw·n)/cos2
        d_lam2 = jnp.where(use3d, d_dep, Z)
        d_rho_r = jnp.sum(jnp.where(use3d, Z, d_dep), 1, keepdims=True)
        d_lam2 = d_lam2 + ddp[0] * dirx + ddp[1] * diry + ddp[2] * dirz
        cos2s, hit, lam2 = gme["cos2s"], gme["hit"], gme["lam2"]
        d_lam_pix = d_lam2 / cos2s
        d_cos2 = jnp.where(hit, -d_lam2 * lam2 / cos2s, Z)
        d_lam = jnp.sum(d_lam_pix, 1, keepdims=True)
        dirv = (dirx, diry, dirz)
        tw_ok = (gme["tw_sq"] > 1e-20).astype(jnp.float32)
        d_tw, d_n = [], []
        for a in range(3):
            d_tw.append(
                -jnp.sum(ddp[a], 1, keepdims=True)
                + d_lam * nv[a]
                + tw_ok * d_rho_r * twv[a] / gme["rho_r"]
            )
            d_n.append(
                d_lam * twv[a]
                + jnp.sum(d_cos2 * dirv[a], 1, keepdims=True)
                + jnp.sum(w * gn[a : a + 1], 1, keepdims=True)
            )
        dop = jnp.sum(dop_pix, 1, keepdims=True)
        d_feat = [jnp.sum(w * gc[c : c + 1], 1, keepdims=True) for c in range(C)]

        zcol = jnp.zeros((CH, 1), jnp.float32)
        pad = jnp.zeros((CH, F - (21 + C)), jnp.float32)
        d_s = jnp.concatenate(
            d_tu + d_tv + d_tw + d_n + [dop, zcol] + d_feat
            + [d_cenx, d_ceny, zcol, zcol, zcol, zcol, zcol, pad],
            axis=1,
        )
        write(i, d_s)

        ACCw = ACCw + jnp.sum(wdir, 0, keepdims=True)
        Am1 = Am1 + jnp.sum(wm, 0, keepdims=True)
        Am2 = Am2 + jnp.sum(wm2, 0, keepdims=True)
        return (i + 1, T_new, done_new, ACCw, Am1, Am2)

    z = lambda r: jnp.zeros((r, NP), jnp.float32)
    init = (
        jnp.zeros((), jnp.int32), jnp.ones((1, NP), jnp.float32), z(1),
        z(1), z(1), z(1),
    )
    jax.lax.while_loop(cond, body, init)


def _bwd_kernel(counts_ref, inst_ref, pix_ref, res_ref, g_ref, dinst_ref,
                *, C, CH, K, F, cfg):
    count = counts_ref[pl.program_id(0)]
    # dead-tail chunks contribute d_s = 0: pre-zero and early-exit
    dinst_ref[0] = jnp.zeros((K, F), jnp.float32)
    read = lambda i: inst_ref[0, pl.ds(i * CH, CH), :]
    write = lambda i, d_s: dinst_ref.__setitem__(
        (0, pl.ds(i * CH, CH), slice(None)), d_s
    )
    _bwd_tile(read, write, count, pix_ref[0], res_ref[0], g_ref[0],
              C=C, CH=CH, F=F, cfg=cfg)


def _bwd_kernel_fused(starts_ref, counts_ref, pix_ref, buf_ref, res_ref,
                      g_ref, dbuf_ref, scr, dscr, sem, dsem,
                      *, C, CH, K, F, cfg):
    """Fused-gather surfel backward: double-buffered window DMA in, VMEM
    gradient block, in-step windowed write-back (ascending grid order
    resolves overlap tails; unwritten rows masked in the VJP)."""
    from .pallas_composite import _fused_window_dma

    t = pl.program_id(0)
    nT = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)
    count = counts_ref[t]
    start = starts_ref[t]

    @pl.when(t == 0)
    def _():
        _fused_window_dma(buf_ref, starts_ref, scr, sem, 0, 0, K).start()

    @pl.when(t + 1 < nT)
    def _():
        _fused_window_dma(
            buf_ref, starts_ref, scr, sem, t + 1, jax.lax.rem(t + 1, 2), K
        ).start()

    dscr[...] = jnp.zeros((K, F), jnp.float32)
    _fused_window_dma(buf_ref, starts_ref, scr, sem, t, slot, K).wait()
    read = lambda i: scr[slot, pl.ds(i * CH, CH), :]
    write = lambda i, d_s: dscr.__setitem__(
        (pl.ds(i * CH, CH), slice(None)), d_s
    )
    _bwd_tile(read, write, count, pix_ref[0], res_ref[0], g_ref[0],
              C=C, CH=CH, F=F, cfg=cfg)
    out = pltpu.make_async_copy(dscr, dbuf_ref.at[pl.ds(start, K), :], dsem)
    out.start()
    out.wait()


def _bwd_call(inst, counts, pix, res, g, C: int, cfg: RasterConfig):
    T, K, F = inst.shape
    NPIX = pix.shape[-1]
    CH = cfg.pallas_chunk
    kernel = functools.partial(_bwd_kernel, C=C, CH=CH, K=K, F=F, cfg=cfg)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, F), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OUT_ROWS, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OUT_ROWS, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, K, F), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, K, F), jnp.float32),
        interpret=_interpret(),
    )(counts, inst, pix, res, g)


def _xla_rows(inst, counts, pix, C: int, cfg: RasterConfig):
    """The XLA chunk-scan composite reshaped to the kernel's output rows —
    the function the custom VJP differentiates."""
    from .surfel import surfel_composite

    Tn, K, F = inst.shape
    inst_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    dirs = jnp.stack([pix[:, 0], pix[:, 1], pix[:, 2]], axis=-1)
    pix_x = pix[:, 3].astype(jnp.int32)
    pix_y = pix[:, 4].astype(jnp.int32)
    (T, _done, color, dep, nrm, m1, m2, dist, med) = surfel_composite(
        inst, inst_valid, dirs, pix_x, pix_y, C, cfg
    )
    pad = jnp.zeros((Tn, OUT_ROWS - C - 9, pix.shape[-1]), jnp.float32)
    return jnp.concatenate(
        [color, dep[:, None], T[:, None], nrm, med[:, None], dist[:, None],
         m1[:, None], m2[:, None], pad], axis=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def surfel_composite_tiles(inst, counts, pix, C: int, cfg: RasterConfig):
    """[T, K, F] packed surfel instances -> [T, 16, NPIX] output rows:
    0..C-1 color, C depth, C+1 final_T, C+2..C+4 normal, C+5 median depth,
    C+6 distortion. NPIX = tile_h * 128 lanes, like the beam kernel."""
    T, K, F = inst.shape
    NPIX = pix.shape[-1]
    CH = cfg.pallas_chunk
    assert K % CH == 0
    kernel = functools.partial(_fwd_kernel, C=C, CH=CH, cfg=cfg)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, F), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, OUT_ROWS, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, OUT_ROWS, NPIX), jnp.float32),
        interpret=_interpret(),
    )(counts, inst, pix)


def _vjp_fwd(inst, counts, pix, C: int, cfg: RasterConfig):
    out = surfel_composite_tiles(inst, counts, pix, C, cfg)
    return out, (inst, counts, pix, out)


def _vjp_bwd(C, cfg, residuals, g):
    inst, counts, pix, out = residuals
    dinst = _bwd_call(inst, counts, pix, out, g, C, cfg)
    zero_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return (dinst, zero_counts, jnp.zeros_like(pix))


def _xla_vjp_bwd(C, cfg, residuals, g):
    """Autodiff-of-the-scan backward — retained as the oracle the kernel is
    tested against (tests/test_surfel_training.py)."""
    inst, counts, pix, _out = residuals
    _, vjp = jax.vjp(lambda x: _xla_rows(x, counts, pix, C, cfg), inst)
    (dinst,) = vjp(g)
    zero_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return (dinst, zero_counts, jnp.zeros_like(pix))


surfel_composite_tiles.defvjp(_vjp_fwd, _vjp_bwd)


def _fused_fwd_call(buf, starts, counts, pix, C: int, cfg: RasterConfig):
    T = counts.shape[0]
    NPIX = pix.shape[-1]
    _, F = buf.shape
    # Mosaic requires DMA slice widths aligned to the (1,128) lane tiling
    # (see pallas_composite._fused_fwd_call): pad the packed feature dim.
    F_pad = -(-F // 128) * 128
    if F_pad != F:
        buf = jnp.pad(buf, ((0, 0), (0, F_pad - F)))
    CH = cfg.pallas_chunk
    K = cfg.tile_capacity
    assert K % CH == 0
    kernel = functools.partial(_fwd_kernel_fused, C=C, CH=CH, K=K, cfg=cfg)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, NPIX), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS, NPIX), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, OUT_ROWS, NPIX), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, K, F_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(starts, counts, pix, buf)


def _fused_bwd_call(buf, starts, counts, pix, res, g, C: int,
                    cfg: RasterConfig):
    T = counts.shape[0]
    NPIX = pix.shape[-1]
    E_pad, F = buf.shape
    F_pad = -(-F // 128) * 128  # lane-tiling alignment, as in the fwd call
    if F_pad != F:
        buf = jnp.pad(buf, ((0, 0), (0, F_pad - F)))
    CH = cfg.pallas_chunk
    K = cfg.tile_capacity
    kernel = functools.partial(
        _bwd_kernel_fused, C=C, CH=CH, K=K, F=F_pad, cfg=cfg
    )
    dbuf = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, NPIX), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, OUT_ROWS, NPIX), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OUT_ROWS, NPIX), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((E_pad, F_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, K, F_pad), jnp.float32),
            pltpu.VMEM((K, F_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(starts, counts, pix, buf, res, g)
    return dbuf[:, :F] if F_pad != F else dbuf


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def surfel_composite_windows(buf, starts, counts, pix, C: int,
                             cfg: RasterConfig):
    """Fused-gather surfel compositing: [E+K, F] dense sorted instance
    buffer + per-tile windows -> [T, 16, 128] output rows (same layout as
    surfel_composite_tiles)."""
    return _fused_fwd_call(buf, starts, counts, pix, C, cfg)


def _fused_vjp_fwd(buf, starts, counts, pix, C: int, cfg: RasterConfig):
    out = _fused_fwd_call(buf, starts, counts, pix, C, cfg)
    return out, (buf, starts, counts, pix, out)


def _fused_vjp_bwd(C, cfg, residuals, g):
    from .pallas_composite import mask_unwritten_rows

    buf, starts, counts, pix, out = residuals
    dbuf = _fused_bwd_call(buf, starts, counts, pix, out, g, C, cfg)
    dbuf = mask_unwritten_rows(dbuf, starts, cfg.tile_capacity)
    zero_i = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (dbuf, zero_i(starts), zero_i(counts), jnp.zeros_like(pix))


surfel_composite_windows.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
