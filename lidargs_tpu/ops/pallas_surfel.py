"""Pallas TPU forward kernel for the surfel (2DGS) variant.

Same tile/lane layout as the beam-splatting kernel (pallas_composite.py):
1x128 tiles, instance chunks on sublanes, prefix-product transmittance with
per-tile dynamic trip counts and transmittance early exit. Implements the
exact per-pixel semantics of the surfel renderCUDA walk (surfel
forward.cu:415-543): ray-plane intersection depth, rho2d low-pass fallback,
and the auxiliary accumulators (normal, median depth, 2DGS distortion).

Backward: rather than hand-deriving the 861-line CUDA backward
(surfel backward.cu), the custom VJP recomputes the same math with the XLA
chunk scan (ops/surfel.py surfel_composite) and lets JAX differentiate it —
the kernel accelerates inference/eval renders ~5x while training gradients
remain the machine-derived deterministic VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RasterConfig
from .pallas_composite import LANES, _chunk_weights, _cummax, _cumsum
from .surfel import SurfelCols as S

OUT_ROWS = 16  # C color, depth, final_T, normal(3), median, distortion


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _surfel_alpha(s, pix, count, base_row, ch, C, cfg: RasterConfig):
    """[CH, F] chunk -> (alpha, passed, depth, m, feat cols, normal cols).
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

    rho_r = jnp.sqrt(jnp.maximum(twx * twx + twy * twy + twz * twz, 1e-20))
    lam = twx * nx + twy * ny + twz * nz                       # [CH, 1]
    cos2 = nx * dirx + ny * diry + nz * dirz                   # [CH, LANES]
    hit = cos2 != 0.0
    lam2 = lam / jnp.where(hit, cos2, 1.0)
    dpx = lam2 * dirx - twx
    dpy = lam2 * diry - twy
    dpz = lam2 * dirz - twz
    tu_tu = jnp.maximum(tux * tux + tuy * tuy + tuz * tuz, 1e-20)
    tv_tv = jnp.maximum(tvx * tvx + tvy * tvy + tvz * tvz, 1e-20)
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

    alpha = jnp.minimum(cfg.alpha_clamp, op * jnp.exp(-0.5 * rho))
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ch, LANES), 0) + base_row
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
    return alpha, passed, depth, m, feat, (nx, ny, nz), rowi


def _fwd_kernel(counts_ref, inst_ref, pix_ref, out_ref, *, C, CH, cfg):
    count = counts_ref[pl.program_id(0)]
    pixb = pix_ref[0]
    pix = (pixb[0:1], pixb[1:2], pixb[2:3], pixb[3:4], pixb[4:5])
    nch = pl.cdiv(count, CH)

    def cond(st):
        return (st[0] < nch) & (jnp.min(st[2]) < 0.5)

    def body(st):
        (i, T, done, cacc, dacc, nacc, m1, m2, dist, med) = st
        s = inst_ref[0, pl.ds(i * CH, CH), :]
        alpha, passed, depth, m, feat, nrm, rowi = _surfel_alpha(
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
        z1 = jnp.zeros((1, LANES), jnp.float32)
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

    z = lambda r: jnp.zeros((r, LANES), jnp.float32)
    init = (
        jnp.zeros((), jnp.int32), jnp.ones((1, LANES), jnp.float32), z(1),
        z(C), z(1), z(3), z(1), z(1), z(1), z(1),
    )
    (_, T, _d, cacc, dacc, nacc, _m1, _m2, dist, med) = jax.lax.while_loop(
        cond, body, init
    )
    out_ref[0] = jnp.concatenate(
        [cacc, dacc, T, nacc, med, dist,
         jnp.zeros((OUT_ROWS - C - 7, LANES), jnp.float32)], 0
    )


def _xla_rows(inst, counts, pix, C: int, cfg: RasterConfig):
    """The XLA chunk-scan composite reshaped to the kernel's output rows —
    the function the custom VJP differentiates."""
    from .surfel import surfel_composite

    Tn, K, F = inst.shape
    inst_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    dirs = jnp.stack([pix[:, 0], pix[:, 1], pix[:, 2]], axis=-1)
    pix_x = pix[:, 3].astype(jnp.int32)
    pix_y = pix[:, 4].astype(jnp.int32)
    (T, _done, color, dep, nrm, _m1, _m2, dist, med) = surfel_composite(
        inst, inst_valid, dirs, pix_x, pix_y, C, cfg
    )
    pad = jnp.zeros((Tn, OUT_ROWS - C - 7, LANES), jnp.float32)
    return jnp.concatenate(
        [color, dep[:, None], T[:, None], nrm, med[:, None], dist[:, None],
         pad], axis=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def surfel_composite_tiles(inst, counts, pix, C: int, cfg: RasterConfig):
    """[T, K, F] packed surfel instances -> [T, 16, 128] output rows:
    0..C-1 color, C depth, C+1 final_T, C+2..C+4 normal, C+5 median depth,
    C+6 distortion."""
    T, K, F = inst.shape
    CH = cfg.pallas_chunk
    assert K % CH == 0
    kernel = functools.partial(_fwd_kernel, C=C, CH=CH, cfg=cfg)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, F), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, OUT_ROWS, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, OUT_ROWS, LANES), jnp.float32),
        interpret=_interpret(),
    )(counts, inst, pix)


def _vjp_fwd(inst, counts, pix, C: int, cfg: RasterConfig):
    out = surfel_composite_tiles(inst, counts, pix, C, cfg)
    return out, (inst, counts, pix)


def _vjp_bwd(C, cfg, residuals, g):
    inst, counts, pix = residuals
    _, vjp = jax.vjp(lambda x: _xla_rows(x, counts, pix, C, cfg), inst)
    (dinst,) = vjp(g)
    zero_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return (dinst, zero_counts, jnp.zeros_like(pix))


surfel_composite_tiles.defvjp(_vjp_fwd, _vjp_bwd)
