"""Pallas TPU compositing kernels — the production hot loop.

TPU-native equivalent of the reference's per-pixel CUDA walk
(`renderCUDA`, forward.cu:502-641) and its backward re-walk
(backward.cu:537-791). One grid step per 1x128 range-view tile:

  * instances live on SUBLANES (chunks of `cfg.pallas_chunk`), the tile's
    128 pixels on LANES — every op is a dense [CH, 128] VPU op;
  * the serial front-to-back walk becomes an exclusive prefix-product of
    (1 - alpha) over sublanes (Hillis-Steele, log2(CH) shifted multiplies),
    which agrees with the true transmittance up to and including the first
    T*(1-alpha) < T_min crossing (see composite.py for the argument);
  * a `lax.while_loop` over chunks gives the two things an XLA scan cannot
    express: a *per-tile* trip count (ceil(count/CH)) and early exit once
    every pixel's transmittance has crossed — the analogue of the CUDA
    kernel's per-thread `done` vote (forward.cu:556,605-613);
  * the backward pass is deterministic: per-instance gradients are dense
    [CH, 128] -> lane-reductions instead of the reference's float atomicAdd
    races (backward.cu:702-788).

The backward kernel is a SINGLE forward-order pass: the chunk-entry
transmittance is the running carry, and every "what's behind" term of the
alpha gradient is a suffix sum `after_i = total - inclusive_prefix_i` with
totals taken from the saved outputs — unlike the CUDA backward, which
re-walks the list back-to-front dividing the saved final_T out
(backward.cu:537-604), there is no second traversal and no division chain.

Gradients flow to the per-gaussian parameters through the (differentiable)
XLA row-gathers that built the [T, K, F] instance tensor — the transpose of
a gather is a deterministic scatter-add, replacing atomicAdd.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RasterConfig
from .projection import PackedCols as PC

LANES = 128          # pixels per tile = lane width
OUT_ROWS = 8         # output block sublanes: C color rows, depth, final_T


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chunk(cfg: RasterConfig) -> int:
    """Effective sublane chunk: the configured pallas_chunk when it divides
    tile_capacity, else the largest divisor of tile_capacity below it —
    pallas_chunk is a perf knob, not a correctness contract, and forcing
    the pallas/fused backends with a small tile_capacity (tests, CLI
    --fused_gather) must not trip shape asserts."""
    K, ch = cfg.tile_capacity, min(cfg.pallas_chunk, cfg.tile_capacity)
    while K % ch:
        ch -= 1
    return ch


def _cummul(x: jnp.ndarray, ch: int) -> jnp.ndarray:
    """Inclusive prefix product along sublanes (Hillis-Steele)."""
    sh = 1
    while sh < ch:
        pad = jnp.ones((sh, x.shape[1]), jnp.float32)
        x = x * jnp.concatenate([pad, x[: ch - sh]], axis=0)
        sh *= 2
    return x


def _cumsum(x: jnp.ndarray, ch: int) -> jnp.ndarray:
    sh = 1
    while sh < ch:
        pad = jnp.zeros((sh, x.shape[1]), jnp.float32)
        x = x + jnp.concatenate([pad, x[: ch - sh]], axis=0)
        sh *= 2
    return x


def _chunk_fields(s: jnp.ndarray, C: int):
    """Split a [CH, F] packed chunk into per-field [CH, 1] columns."""
    col = lambda i: s[:, i : i + 1]
    rect = PC.rect(C)
    return dict(
        mx=col(0), my=col(1), mz=col(2),
        u1x=col(3), u1y=col(4), u1z=col(5),
        u2x=col(6), u2y=col(7), u2z=col(8),
        ca=col(9), cb=col(10), cc=col(11),
        op=col(PC.OPACITY), dep=col(PC.DEPTH),
        feat=[col(PC.FEAT0 + c) for c in range(C)],
        x0=col(rect.start), x1=col(rect.start + 1),
        y0=col(rect.start + 2), y1=col(rect.start + 3),
    )


def _alpha_pass(f, pix, count, base_row, ch, cfg: RasterConfig):
    """Shared forward math for one [CH, LANES] chunk: alpha + pass mask.
    Mirrors instance_alpha (composite.py) / forward.cu:584-607.

    The packed u1/u2 are UNIT vectors by construction (projection.py
    normalizes u1 and u2 = dirn x u1 with |dirn| = |u1| = 1), so the
    reference's /|u|^2 division is the identity and is omitted; gradients
    agree on the reachable manifold because normalization makes upstream
    perturbations of u1/u2 tangential."""
    dirx, diry, dirz, px, py = pix
    dxv = f["mx"] - dirx
    dyv = f["my"] - diry
    dzv = f["mz"] - dirz
    ddx = dxv * f["u1x"] + dyv * f["u1y"] + dzv * f["u1z"]
    ddy = dxv * f["u2x"] + dyv * f["u2y"] + dzv * f["u2z"]
    power = (
        -0.5 * (f["ca"] * ddx * ddx + f["cc"] * ddy * ddy) - f["cb"] * ddx * ddy
    )
    e = jnp.exp(power)
    araw = f["op"] * e
    alpha = jnp.minimum(araw, cfg.alpha_clamp)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ch, dirx.shape[-1]), 0) + base_row
    passed = (
        (rowi < count)
        & (px >= f["x0"]) & (px < f["x1"]) & (py >= f["y0"]) & (py < f["y1"])
        & (power <= 0.0)
        & (alpha >= cfg.alpha_min)
    )
    geom = dict(dxv=dxv, dyv=dyv, dzv=dzv,
                ddx=ddx, ddy=ddy, power=power, e=e, araw=araw)
    return alpha, passed, geom


def _chunk_weights(alpha, passed, T, done, cfg: RasterConfig, ch: int):
    """Prefix-product weights + crossing bookkeeping for one chunk. The
    prefix uses PASSED instances (exactly like composite_chunk): it agrees
    with the true transmittance up to and including the first crossing, and
    everything at/after the crossing gets w=0.

    Dead-row detection is ONE compare instead of a crossing scan: `incl` is
    non-increasing (every factor <= 1), and a crossing at j (passed_j with
    T*excl_j*(1-alpha_j) = T*incl_j < T_min) exists for some j <= i exactly
    when T*incl_i < T_min — the first index where incl drops below the
    threshold is necessarily a passed one, since incl only changes at passed
    rows. That replaces the previous crossing+cummax+first-crossing-select
    machinery (a 7-step Hillis-Steele cummax plus shifted selects per chunk,
    in forward AND backward) with a broadcast multiply and a compare."""
    a_eff = jnp.where(passed, alpha, 0.0)
    one_m = 1.0 - a_eff
    incl = _cummul(one_m, ch)
    excl = jnp.concatenate(
        [jnp.ones((1, alpha.shape[1]), jnp.float32), incl[: ch - 1]], axis=0
    )
    P = T * excl
    Tincl = T * incl
    dead = Tincl < cfg.transmittance_min      # == "at/after the first crossing"
    applied = passed & ~dead & (done < 0.5)
    w = jnp.where(applied, alpha * P, 0.0)
    # T after the chunk = T * prod over applied rows of (1-alpha): dead rows
    # contribute factor 1, so it is the last row of a cumprod over the masked
    # factors (all-dead leaves T unchanged, matching the walk stopping at the
    # crossing without applying it). A sublane reduce would be fewer ops but
    # its replicated result layout hits Mosaic's unimplemented sublane
    # broadcast in the consuming multiply; the cumprod's static [1, NP] slice
    # lowers cleanly.
    t_fac = _cummul(jnp.where(dead, 1.0, one_m), ch)[ch - 1 : ch]
    T_new = T * jnp.where(done < 0.5, t_fac, 1.0)
    # done if the chunk crossed (last row dead) or T itself fell under
    done_new = jnp.maximum(done, jnp.where(dead[ch - 1 : ch], 1.0, 0.0))
    done_new = jnp.maximum(
        done_new, jnp.where(T_new < cfg.transmittance_min, 1.0, 0.0)
    )
    return w, applied, P, T_new, done_new


def _fwd_kernel(counts_ref, inst_ref, pix_ref, out_ref, *, C, CH, TB, cfg):
    for b in range(TB):               # TB tiles per grid step (unrolled);
        count = counts_ref[pl.program_id(0) * TB + b]   # own trip count +
        pixb = pix_ref[b]                               # early exit each
        pix = (pixb[0:1], pixb[1:2], pixb[2:3], pixb[3:4], pixb[4:5])
        NP = pixb.shape[-1]
        nch = pl.cdiv(count, CH)

        def cond(st):
            i, T, done, cacc, dacc = st
            return (i < nch) & (jnp.min(done) < 0.5)

        def body(st):
            i, T, done, cacc, dacc = st
            s = inst_ref[b, pl.ds(i * CH, CH), :]
            f = _chunk_fields(s, C)
            alpha, passed, _ = _alpha_pass(f, pix, count, i * CH, CH, cfg)
            w, applied, _P, T, done = _chunk_weights(alpha, passed, T, done, cfg, CH)
            cacc = cacc + jnp.concatenate(
                [jnp.sum(w * f["feat"][c], axis=0, keepdims=True) for c in range(C)],
                axis=0,
            )
            dacc = dacc + jnp.sum(w * f["dep"], axis=0, keepdims=True)
            return (i + 1, T, done, cacc, dacc)

        init = (
            jnp.zeros((), jnp.int32),
            jnp.ones((1, NP), jnp.float32),
            jnp.zeros((1, NP), jnp.float32),
            jnp.zeros((C, NP), jnp.float32),
            jnp.zeros((1, NP), jnp.float32),
        )
        _, T, _done, cacc, dacc = jax.lax.while_loop(cond, body, init)
        out_ref[b] = jnp.concatenate(
            [cacc, dacc, T, jnp.zeros((OUT_ROWS - C - 2, NP), jnp.float32)], axis=0
        )


def _bwd_kernel(counts_ref, inst_ref, pix_ref, res_ref, g_ref, dinst_ref,
                *, C, CH, K, F, TB, cfg):
    """Single forward-order pass: the chunk-entry transmittance IS the
    running carry, and every suffix term is `total - running prefix`
    (totals = the saved outputs) — no replay pass, unlike the CUDA
    backward's saved-final_T back-to-front re-walk (backward.cu:537-604)."""
    for b in range(TB):
        _bwd_tile(counts_ref, inst_ref, pix_ref, res_ref, g_ref, dinst_ref,
                  b, C=C, CH=CH, K=K, F=F, TB=TB, cfg=cfg)


def _bwd_tile(counts_ref, inst_ref, pix_ref, res_ref, g_ref, dinst_ref,
              b, *, C, CH, K, F, TB, cfg):
    count = counts_ref[pl.program_id(0) * TB + b]
    pixb = pix_ref[b]
    pix = (pixb[0:1], pixb[1:2], pixb[2:3], pixb[3:4], pixb[4:5])
    NP = pixb.shape[-1]
    res = res_ref[b]
    totc = res[0:C]                      # final color (sum of all applied w*c)
    totd = res[C : C + 1]
    Tfin = res[C + 1 : C + 2]
    g = g_ref[b]
    gc = g[0:C]
    gd = g[C : C + 1]
    gT = g[C + 1 : C + 2]
    # every suffix term is linear in its cumsum, so the whole `behind`
    # collapses to ONE prefix scan of w*direct:
    #   sum_x g_x (tot_x - A_x - incl(w*x)) = TOT - ACCw - incl(w*direct)
    # — one cumsum per chunk instead of C+1, one [1, NP] carry instead of
    # [C+1, NP]
    TOT = (jnp.sum(gc * totc, axis=0, keepdims=True) + gd * totd)

    # dynamic trip count + transmittance early exit, like the forward: once
    # every lane is done, later chunks contribute d_s = 0 — pre-zero the
    # block and stop (at saturated tiles the forward walks ~2 of 3 chunks;
    # skipping the dead tail here is a ~10% train-step win)
    dinst_ref[b] = jnp.zeros((K, F), jnp.float32)
    nch = pl.cdiv(count, CH)

    def cond(st):
        i, T, done, ACCw = st
        return (i < nch) & (jnp.min(done) < 0.5)

    def body(st):
        i, T, done, ACCw = st             # T/done at chunk ENTRY; ACCw =
        s = inst_ref[b, pl.ds(i * CH, CH), :]   # sum of w*direct, chunks < i
        f = _chunk_fields(s, C)
        alpha, passed, gm = _alpha_pass(f, pix, count, i * CH, CH, cfg)
        w, applied, P, T_new, done_new = _chunk_weights(alpha, passed, T, done, cfg, CH)

        direct = sum(gc[c : c + 1] * f["feat"][c] for c in range(C)) + gd * f["dep"]
        wdir = w * direct
        behind = TOT - ACCw - _cumsum(wdir, CH)
        inv1m = 1.0 / (1.0 - alpha)
        dalpha = P * direct - inv1m * (behind + gT * Tfin)
        live = applied & (gm["araw"] <= cfg.alpha_clamp)
        Z = jnp.zeros((CH, NP), jnp.float32)
        dalpha = jnp.where(live, dalpha, Z)
        dpower = jnp.where(live, dalpha * gm["araw"], Z)
        dop = jnp.sum(jnp.where(live, dalpha * gm["e"], Z), axis=1, keepdims=True)

        ddx, ddy = gm["ddx"], gm["ddy"]
        d_ca = jnp.sum(jnp.where(live, -0.5 * ddx * ddx * dpower, Z), 1, keepdims=True)
        d_cb = jnp.sum(jnp.where(live, -ddx * ddy * dpower, Z), 1, keepdims=True)
        d_cc = jnp.sum(jnp.where(live, -0.5 * ddy * ddy * dpower, Z), 1, keepdims=True)
        d_ddx = jnp.where(live, -dpower * (f["ca"] * ddx + f["cb"] * ddy), Z)
        d_ddy = jnp.where(live, -dpower * (f["cc"] * ddy + f["cb"] * ddx), Z)

        # unit-basis: d(ddx)/du1 = dxv directly (no /|u1|^2 chain — see
        # _alpha_pass); the radial component a true quotient rule would add
        # is annihilated upstream by the normalization's tangential Jacobian
        d_n1 = d_ddx
        d_n2 = d_ddy
        d_mx = jnp.sum(d_n1 * f["u1x"] + d_n2 * f["u2x"], 1, keepdims=True)
        d_my = jnp.sum(d_n1 * f["u1y"] + d_n2 * f["u2y"], 1, keepdims=True)
        d_mz = jnp.sum(d_n1 * f["u1z"] + d_n2 * f["u2z"], 1, keepdims=True)
        d_u1x = jnp.sum(d_n1 * gm["dxv"], 1, keepdims=True)
        d_u1y = jnp.sum(d_n1 * gm["dyv"], 1, keepdims=True)
        d_u1z = jnp.sum(d_n1 * gm["dzv"], 1, keepdims=True)
        d_u2x = jnp.sum(d_n2 * gm["dxv"], 1, keepdims=True)
        d_u2y = jnp.sum(d_n2 * gm["dyv"], 1, keepdims=True)
        d_u2z = jnp.sum(d_n2 * gm["dzv"], 1, keepdims=True)

        d_feat = [jnp.sum(w * gc[c : c + 1], 1, keepdims=True) for c in range(C)]
        d_dep = jnp.sum(w * gd, 1, keepdims=True)

        pad = jnp.zeros((CH, F - PC.FEAT0 - C), jnp.float32)
        d_s = jnp.concatenate(
            [d_mx, d_my, d_mz, d_u1x, d_u1y, d_u1z, d_u2x, d_u2y, d_u2z,
             d_ca, d_cb, d_cc, dop, d_dep] + d_feat + [pad],
            axis=1,
        )
        dinst_ref[b, pl.ds(i * CH, CH), :] = d_s

        ACCw = ACCw + jnp.sum(wdir, axis=0, keepdims=True)
        return (i + 1, T_new, done_new, ACCw)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((1, NP), jnp.float32),
        jnp.zeros((1, NP), jnp.float32),
        jnp.zeros((1, NP), jnp.float32),
    )
    jax.lax.while_loop(cond, body, init)


def _fused_window_dma(buf_ref, starts_ref, scr, sem, t, slot, K):
    return pltpu.make_async_copy(
        buf_ref.at[pl.ds(starts_ref[t], K), :], scr.at[slot], sem.at[slot]
    )


def _fwd_kernel_fused(starts_ref, counts_ref, pix_ref, buf_ref, out_ref,
                      scr, sem, *, C, CH, K, cfg):
    """Fused-gather forward: the per-tile instance rows live in ONE dense
    depth-sorted buffer (buf, HBM); each grid step DMAs its contiguous
    window [start, start+K) into VMEM instead of reading a pre-materialized
    [T, K, F] tensor — the XLA gather that built that tensor (a ~4x-larger
    random row gather + full HBM round-trip) disappears. Input windows are
    double-buffered: tile t+1's copy is issued before tile t's compute."""
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

    pixb = pix_ref[0]
    pix = (pixb[0:1], pixb[1:2], pixb[2:3], pixb[3:4], pixb[4:5])
    NP = pixb.shape[-1]
    nch = pl.cdiv(count, CH)
    _fused_window_dma(buf_ref, starts_ref, scr, sem, t, slot, K).wait()
    scratch = scr.at[slot]

    def cond(st):
        i, T_, done, cacc, dacc = st
        return (i < nch) & (jnp.min(done) < 0.5)

    def body(st):
        i, T_, done, cacc, dacc = st
        s = scratch[pl.ds(i * CH, CH), :]
        f = _chunk_fields(s, C)
        alpha, passed, _ = _alpha_pass(f, pix, count, i * CH, CH, cfg)
        w, applied, _P, T_, done = _chunk_weights(alpha, passed, T_, done, cfg, CH)
        cacc = cacc + jnp.concatenate(
            [jnp.sum(w * f["feat"][c], axis=0, keepdims=True) for c in range(C)],
            axis=0,
        )
        dacc = dacc + jnp.sum(w * f["dep"], axis=0, keepdims=True)
        return (i + 1, T_, done, cacc, dacc)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((1, NP), jnp.float32),
        jnp.zeros((1, NP), jnp.float32),
        jnp.zeros((C, NP), jnp.float32),
        jnp.zeros((1, NP), jnp.float32),
    )
    _, T_, _done, cacc, dacc = jax.lax.while_loop(cond, body, init)
    out_ref[0] = jnp.concatenate(
        [cacc, dacc, T_, jnp.zeros((OUT_ROWS - C - 2, NP), jnp.float32)], axis=0
    )


def _bwd_kernel_fused(starts_ref, counts_ref, pix_ref, buf_ref, res_ref,
                      g_ref, dbuf_ref, scr, dscr, sem, dsem,
                      *, C, CH, K, F, cfg):
    """Fused-gather backward: window-DMA the instances in (double-buffered
    like the forward), accumulate the per-instance gradient block in VMEM,
    window-DMA it out. Windows of adjacent tiles overlap in their
    [count, K) tails; TPU grid steps run sequentially in ascending order
    and each step awaits its out-copy before returning, so a later tile's
    real rows overwrite an earlier tile's zero tail. Rows in no tile's
    first-K window (per-tile overflow, slots past the emission total) are
    masked to zero OUTSIDE the kernel."""
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

    pixb = pix_ref[0]
    pix = (pixb[0:1], pixb[1:2], pixb[2:3], pixb[3:4], pixb[4:5])
    NP = pixb.shape[-1]
    res = res_ref[0]
    totc = res[0:C]
    totd = res[C : C + 1]
    Tfin = res[C + 1 : C + 2]
    g = g_ref[0]
    gc = g[0:C]
    gd = g[C : C + 1]
    gT = g[C + 1 : C + 2]
    # one fused suffix scan, as in _bwd_tile (linearity of cumsum)
    TOT = (jnp.sum(gc * totc, axis=0, keepdims=True) + gd * totd)
    dscr[...] = jnp.zeros((K, F), jnp.float32)
    nch = pl.cdiv(count, CH)
    _fused_window_dma(buf_ref, starts_ref, scr, sem, t, slot, K).wait()
    scratch = scr.at[slot]

    def cond(st):
        i, T_, done, ACCw = st
        return (i < nch) & (jnp.min(done) < 0.5)

    def body(st):
        i, T_, done, ACCw = st
        s = scratch[pl.ds(i * CH, CH), :]
        f = _chunk_fields(s, C)
        alpha, passed, gm = _alpha_pass(f, pix, count, i * CH, CH, cfg)
        w, applied, P, T_new, done_new = _chunk_weights(alpha, passed, T_, done, cfg, CH)

        direct = sum(gc[c : c + 1] * f["feat"][c] for c in range(C)) + gd * f["dep"]
        wdir = w * direct
        behind = TOT - ACCw - _cumsum(wdir, CH)
        inv1m = 1.0 / (1.0 - alpha)
        dalpha = P * direct - inv1m * (behind + gT * Tfin)
        live = applied & (gm["araw"] <= cfg.alpha_clamp)
        Z = jnp.zeros((CH, NP), jnp.float32)
        dalpha = jnp.where(live, dalpha, Z)
        dpower = jnp.where(live, dalpha * gm["araw"], Z)
        dop = jnp.sum(jnp.where(live, dalpha * gm["e"], Z), axis=1, keepdims=True)

        ddx, ddy = gm["ddx"], gm["ddy"]
        d_ca = jnp.sum(jnp.where(live, -0.5 * ddx * ddx * dpower, Z), 1, keepdims=True)
        d_cb = jnp.sum(jnp.where(live, -ddx * ddy * dpower, Z), 1, keepdims=True)
        d_cc = jnp.sum(jnp.where(live, -0.5 * ddy * ddy * dpower, Z), 1, keepdims=True)
        d_ddx = jnp.where(live, -dpower * (f["ca"] * ddx + f["cb"] * ddy), Z)
        d_ddy = jnp.where(live, -dpower * (f["cc"] * ddy + f["cb"] * ddx), Z)

        d_n1 = d_ddx
        d_n2 = d_ddy
        d_mx = jnp.sum(d_n1 * f["u1x"] + d_n2 * f["u2x"], 1, keepdims=True)
        d_my = jnp.sum(d_n1 * f["u1y"] + d_n2 * f["u2y"], 1, keepdims=True)
        d_mz = jnp.sum(d_n1 * f["u1z"] + d_n2 * f["u2z"], 1, keepdims=True)
        d_u1x = jnp.sum(d_n1 * gm["dxv"], 1, keepdims=True)
        d_u1y = jnp.sum(d_n1 * gm["dyv"], 1, keepdims=True)
        d_u1z = jnp.sum(d_n1 * gm["dzv"], 1, keepdims=True)
        d_u2x = jnp.sum(d_n2 * gm["dxv"], 1, keepdims=True)
        d_u2y = jnp.sum(d_n2 * gm["dyv"], 1, keepdims=True)
        d_u2z = jnp.sum(d_n2 * gm["dzv"], 1, keepdims=True)

        d_feat = [jnp.sum(w * gc[c : c + 1], 1, keepdims=True) for c in range(C)]
        d_dep = jnp.sum(w * gd, 1, keepdims=True)

        pad = jnp.zeros((CH, F - PC.FEAT0 - C), jnp.float32)
        d_s = jnp.concatenate(
            [d_mx, d_my, d_mz, d_u1x, d_u1y, d_u1z, d_u2x, d_u2y, d_u2z,
             d_ca, d_cb, d_cc, dop, d_dep] + d_feat + [pad],
            axis=1,
        )
        dscr[pl.ds(i * CH, CH), :] = d_s

        ACCw = ACCw + jnp.sum(wdir, axis=0, keepdims=True)
        return (i + 1, T_new, done_new, ACCw)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((1, NP), jnp.float32),
        jnp.zeros((1, NP), jnp.float32),
        jnp.zeros((1, NP), jnp.float32),
    )
    jax.lax.while_loop(cond, body, init)
    out = pltpu.make_async_copy(dscr, dbuf_ref.at[pl.ds(start, K), :], dsem)
    out.start()
    out.wait()


def _fused_fwd_call(buf, starts, counts, pix, C: int, cfg: RasterConfig):
    """buf: [E + K, F] dense depth-sorted instance rows (K zero-padded);
    starts/counts: [T] per-tile windows into buf."""
    T = counts.shape[0]
    NPIX = pix.shape[-1]
    _, F = buf.shape
    # Mosaic requires DMA slice widths aligned to the (1,128) lane tiling:
    # pad the packed feature dim to a multiple of 128 (the pad lanes ride
    # along in each window copy; at K=256-384 that is <0.5 ms/frame of HBM
    # traffic and the alternative — a 24-lane slice — does not compile).
    F_pad = -(-F // 128) * 128
    if F_pad != F:
        buf = jnp.pad(buf, ((0, 0), (0, F_pad - F)))
    CH = _chunk(cfg)
    K = cfg.tile_capacity
    assert K % CH == 0
    kernel = functools.partial(_fwd_kernel_fused, C=C, CH=CH, K=K, cfg=cfg)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, OUT_ROWS, NPIX), lambda t: (t, 0, 0),
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
    CH = _chunk(cfg)
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
            pl.BlockSpec((1, OUT_ROWS, NPIX), lambda t: (t, 0, 0),
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
def composite_windows_pallas(buf, starts, counts, pix, C: int,
                             cfg: RasterConfig):
    """Fused-gather compositing: [E+K, F] dense sorted instance buffer +
    per-tile [T] windows -> [T, 8, 128] output rows (same layout as
    composite_tiles_pallas). Gradients flow to buf (rows not in any tile's
    first-K window are zeroed by the caller's slot mask)."""
    return _fused_fwd_call(buf, starts, counts, pix, C, cfg)


def _fused_vjp_fwd(buf, starts, counts, pix, C: int, cfg: RasterConfig):
    out = _fused_fwd_call(buf, starts, counts, pix, C, cfg)
    return out, (buf, starts, counts, pix, out)


def mask_unwritten_rows(dbuf, starts, K: int):
    """Zero rows in NO tile's [start, start+K) window (per-tile overflow
    gaps and the sentinel tail) — the kernel never writes them, so they can
    be NaN; mask with where, not multiply."""
    r = jnp.arange(dbuf.shape[0], dtype=jnp.int32)
    t = jnp.clip(
        jnp.searchsorted(starts, r, side="right").astype(jnp.int32) - 1,
        0, starts.shape[0] - 1,
    )
    written = (r >= starts[t]) & (r < starts[t] + K)
    return jnp.where(written[:, None], dbuf, 0.0)


def _fused_vjp_bwd(C, cfg, residuals, g):
    buf, starts, counts, pix, out = residuals
    dbuf = _fused_bwd_call(buf, starts, counts, pix, out, g, C, cfg)
    dbuf = mask_unwritten_rows(dbuf, starts, cfg.tile_capacity)
    zero_i = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (dbuf, zero_i(starts), zero_i(counts), jnp.zeros_like(pix))


composite_windows_pallas.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def _tb_pad(cfg: RasterConfig, T: int):
    """Tiles-per-block + padded tile count (pad tiles have count 0)."""
    TB = max(1, cfg.pallas_tiles_per_block)
    Tp = -(-T // TB) * TB
    return TB, Tp


def _fwd_call(inst, counts, pix, C: int, cfg: RasterConfig):
    T, K, F = inst.shape
    NPIX = pix.shape[-1]
    CH = _chunk(cfg)
    assert K % CH == 0, f"tile_capacity {K} must be a multiple of pallas_chunk {CH}"
    assert C + 2 <= OUT_ROWS
    TB, Tp = _tb_pad(cfg, T)
    if Tp != T:
        inst = jnp.pad(inst, ((0, Tp - T), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, Tp - T))
        pix = jnp.pad(pix, ((0, Tp - T), (0, 0), (0, 0)))
    kernel = functools.partial(_fwd_kernel, C=C, CH=CH, TB=TB, cfg=cfg)
    out = pl.pallas_call(
        kernel,
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, K, F), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, OUT_ROWS, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, OUT_ROWS, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, OUT_ROWS, NPIX), jnp.float32),
        interpret=_interpret(),
    )(counts, inst, pix)
    return out[:T]


def _bwd_call(inst, counts, pix, res, g, C: int, cfg: RasterConfig):
    T, K, F = inst.shape
    NPIX = pix.shape[-1]
    CH = _chunk(cfg)
    TB, Tp = _tb_pad(cfg, T)
    if Tp != T:
        inst = jnp.pad(inst, ((0, Tp - T), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, Tp - T))
        pix = jnp.pad(pix, ((0, Tp - T), (0, 0), (0, 0)))
        res = jnp.pad(res, ((0, Tp - T), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, Tp - T), (0, 0), (0, 0)))
    kernel = functools.partial(_bwd_kernel, C=C, CH=CH, K=K, F=F, TB=TB, cfg=cfg)
    dinst = pl.pallas_call(
        kernel,
        grid=(Tp // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, K, F), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, OUT_ROWS, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, OUT_ROWS, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, OUT_ROWS, NPIX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, K, F), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, K, F), jnp.float32),
        interpret=_interpret(),
    )(counts, inst, pix, res, g)
    return dinst[:T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def composite_tiles_pallas(inst, counts, pix, C: int, cfg: RasterConfig):
    """[T, K, F] packed depth-ordered instances + [T] counts + [T, 8, 128]
    pixel blocks -> [T, 8, 128]: rows 0..C-1 color, row C depth, row C+1
    final transmittance."""
    return _fwd_call(inst, counts, pix, C, cfg)


def _vjp_fwd(inst, counts, pix, C: int, cfg: RasterConfig):
    out = _fwd_call(inst, counts, pix, C, cfg)
    return out, (inst, counts, pix, out)


def _vjp_bwd(C, cfg, residuals, g):
    inst, counts, pix, out = residuals
    dinst = _bwd_call(inst, counts, pix, out, g, C, cfg)
    zero_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return (dinst, zero_counts, jnp.zeros_like(pix))


composite_tiles_pallas.defvjp(_vjp_fwd, _vjp_bwd)
