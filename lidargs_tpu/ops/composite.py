"""Depth-ordered alpha compositing over chunked instance lists.

TPU-native re-design of the reference's per-pixel sorted-list walk
(`renderCUDA`, forward.cu:502-641). Instead of one CUDA thread per pixel
walking shared-memory batches with data-dependent early exit, we process
[n_lists, chunk, n_pix] dense blocks and express the *exact* front-to-back
semantics with prefix products:

  For pixel p and depth-ordered instances i with alpha test pass_i,
  the CUDA walk maintains T and stops at the first i where
  T*(1-alpha_i) < T_min, skipping that instance too (forward.cu:605-613).
  Because (1-alpha) factors are <= 1, the naive prefix
  P_i = T_in * prod_{j<i} (1-alpha_j * pass_j) agrees with the true
  transmittance for every i up to and including the first crossing, so the
  crossing index — and therefore the set of applied instances and their
  weights w_i = alpha_i * P_i — can be computed with a cumprod + cummax
  instead of a serial loop. Deterministic by construction (the reference's
  float atomicAdd backward is not).

The same routine serves the O(P*HW) golden renderer (one list = the whole
image) and the tiled production path (one list per tile).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig


class CompositeOut(NamedTuple):
    color: jnp.ndarray    # [n_lists, C, n_pix]
    depth: jnp.ndarray    # [n_lists, n_pix]
    final_T: jnp.ndarray  # [n_lists, n_pix]


class _Gathered(NamedTuple):
    """One chunk of per-instance gaussian state, gathered for a list."""

    sphere_mean: jnp.ndarray  # [L, K, 3]
    u1: jnp.ndarray           # [L, K, 3]
    u2: jnp.ndarray           # [L, K, 3]
    conic: jnp.ndarray        # [L, K, 3]
    opacity: jnp.ndarray      # [L, K]
    depth: jnp.ndarray        # [L, K]
    feat: jnp.ndarray         # [L, K, C]
    pix_rect: jnp.ndarray     # [L, K, 4]
    valid: jnp.ndarray        # [L, K]


def gather_instances(splats, ids: jnp.ndarray, valid: jnp.ndarray) -> _Gathered:
    g = lambda x: jnp.take(x, ids, axis=0)
    return _Gathered(
        sphere_mean=g(splats.sphere_mean),
        u1=g(splats.u1),
        u2=g(splats.u2),
        conic=g(splats.conic),
        opacity=g(splats.opacity),
        depth=g(splats.depth),
        feat=g(splats.feat),
        pix_rect=g(splats.pix_rect),
        valid=valid & g(splats.valid),
    )


def instance_alpha(
    ch: _Gathered,
    pix_dir: jnp.ndarray,   # [L, n_pix, 3] unit ray dirs
    pix_x: jnp.ndarray,     # [L, n_pix] int columns
    pix_y: jnp.ndarray,     # [L, n_pix] int rows
    cfg: RasterConfig,
):
    """Alpha + pass mask for a [L, K] chunk against [L, n_pix] pixels.
    Math of forward.cu:584-607 plus the parity-rect test (see projection.py)."""
    # offset on the unit sphere, projected on the cross-section basis
    d_vec = ch.sphere_mean[:, :, None, :] - pix_dir[:, None, :, :]   # [L,K,npix,3]
    u1 = ch.u1[:, :, None, :]
    u2 = ch.u2[:, :, None, :]
    u1_sq = jnp.sum(ch.u1 * ch.u1, -1)[:, :, None]
    u2_sq = jnp.sum(ch.u2 * ch.u2, -1)[:, :, None]
    dx = jnp.sum(d_vec * u1, -1) / jnp.maximum(u1_sq, 1e-20)
    dy = jnp.sum(d_vec * u2, -1) / jnp.maximum(u2_sq, 1e-20)

    con = ch.conic
    power = (
        -0.5 * (con[:, :, 0, None] * dx * dx + con[:, :, 2, None] * dy * dy)
        - con[:, :, 1, None] * dx * dy
    )
    alpha = jnp.minimum(cfg.alpha_clamp, ch.opacity[:, :, None] * jnp.exp(power))

    rect = ch.pix_rect
    in_rect = (
        (pix_x[:, None, :] >= rect[:, :, 0, None])
        & (pix_x[:, None, :] < rect[:, :, 1, None])
        & (pix_y[:, None, :] >= rect[:, :, 2, None])
        & (pix_y[:, None, :] < rect[:, :, 3, None])
    )
    pass_ = (
        ch.valid[:, :, None]
        & in_rect
        & (power <= 0.0)
        & (alpha >= cfg.alpha_min)
    )
    return alpha, pass_


def composite_chunk(carry, ch_alpha_pass_featdep, cfg: RasterConfig):
    """One scan step: fold a [L, K, n_pix] chunk into the running
    (T, done, color, depth) state using the prefix-product formulation."""
    T, done, color, depth_acc = carry
    alpha, pass_, feat, dep = ch_alpha_pass_featdep

    a_eff = jnp.where(pass_, alpha, 0.0)                         # [L,K,npix]
    one_m = 1.0 - a_eff
    # exclusive prefix product within the chunk, seeded by carry T
    prefix = jnp.concatenate(
        [jnp.ones_like(one_m[:, :1]), jnp.cumprod(one_m, axis=1)[:, :-1]], axis=1
    )
    P = T[:, None, :] * prefix                                   # naive transmittance
    crossing = pass_ & (P * (1.0 - alpha) < cfg.transmittance_min)
    dead = jnp.cumsum(crossing.astype(jnp.int32), axis=1) > 0    # at-or-after first
    applied = pass_ & ~dead & ~done[:, None, :]

    w = jnp.where(applied, alpha * P, 0.0)                       # [L,K,npix]
    color = color + jnp.einsum(
        "lkp,lkc->lcp", w, feat, precision=jax.lax.Precision.HIGHEST
    )
    depth_acc = depth_acc + jnp.sum(w * dep[:, :, None], axis=1)
    T = T * jnp.prod(jnp.where(applied, 1.0 - alpha, 1.0), axis=1)
    done = done | jnp.any(crossing & ~done[:, None, :], axis=1)
    return (T, done, color, depth_acc)


def composite_depth_ordered(
    splats,
    sorted_ids: jnp.ndarray,     # [L, K_total] per-list depth-ordered gaussian ids
    sorted_valid: jnp.ndarray,   # [L, K_total] instance validity
    pix_dir: jnp.ndarray,        # [L, n_pix, 3]
    pix_x: jnp.ndarray,          # [L, n_pix]
    pix_y: jnp.ndarray,          # [L, n_pix]
    cfg: RasterConfig,
) -> CompositeOut:
    """Composite each list's instances (already depth-sorted) over its pixels.

    Differentiable via JAX AD (each chunk is rematerialized in the backward
    pass with jax.checkpoint); the production wrapper in rasterize.py layers
    a custom VJP with the densification statistics on top.
    """
    L, K_total = sorted_ids.shape
    n_pix = pix_x.shape[1]
    C = splats.feat.shape[-1]
    K = min(cfg.chunk, K_total)
    n_chunks = -(-K_total // K)
    pad = n_chunks * K - K_total
    if pad:
        sorted_ids = jnp.pad(sorted_ids, ((0, 0), (0, pad)))
        sorted_valid = jnp.pad(sorted_valid, ((0, 0), (0, pad)))
    ids_c = sorted_ids.reshape(L, n_chunks, K).transpose(1, 0, 2)
    valid_c = sorted_valid.reshape(L, n_chunks, K).transpose(1, 0, 2)

    init = (
        jnp.ones((L, n_pix), jnp.float32),
        jnp.zeros((L, n_pix), jnp.bool_),
        jnp.zeros((L, C, n_pix), jnp.float32),
        jnp.zeros((L, n_pix), jnp.float32),
    )

    @jax.checkpoint
    def step(carry, idx_valid):
        ids, valid = idx_valid
        ch = gather_instances(splats, ids, valid)
        alpha, pass_ = instance_alpha(ch, pix_dir, pix_x, pix_y, cfg)
        carry = composite_chunk(carry, (alpha, pass_, ch.feat, ch.depth), cfg)
        return carry, None

    (T, _done, color, depth), _ = jax.lax.scan(step, init, (ids_c, valid_c))
    return CompositeOut(color=color, depth=depth, final_T=T)


def composite_packed(
    inst: jnp.ndarray,           # [L, K, F] pre-gathered packed instances (PackedCols)
    inst_valid: jnp.ndarray,     # [L, K] front-packed validity
    pix_dir: jnp.ndarray,        # [L, n_pix, 3]
    pix_x: jnp.ndarray,          # [L, n_pix]
    pix_y: jnp.ndarray,          # [L, n_pix]
    C: int,
    cfg: RasterConfig,
) -> CompositeOut:
    """Same semantics as composite_depth_ordered, but on instances that were
    already gathered into one dense [L, K, F] tensor (gather-free scan — one
    wide row-gather upstream replaces ~10 narrow gathers per chunk)."""
    from .projection import PackedCols as PC

    L, K_total, F = inst.shape
    n_pix = pix_x.shape[1]
    K = min(cfg.chunk, K_total)
    n_chunks = -(-K_total // K)
    pad = n_chunks * K - K_total
    if pad:
        inst = jnp.pad(inst, ((0, 0), (0, pad), (0, 0)))
        inst_valid = jnp.pad(inst_valid, ((0, 0), (0, pad)))
    inst_c = inst.reshape(L, n_chunks, K, F).transpose(1, 0, 2, 3)
    valid_c = inst_valid.reshape(L, n_chunks, K).transpose(1, 0, 2)

    init = (
        jnp.ones((L, n_pix), jnp.float32),
        jnp.zeros((L, n_pix), jnp.bool_),
        jnp.zeros((L, C, n_pix), jnp.float32),
        jnp.zeros((L, n_pix), jnp.float32),
    )

    @jax.checkpoint
    def step(carry, ch_v):
        ch_i, valid = ch_v
        ch = _Gathered(
            sphere_mean=ch_i[..., PC.MEAN],
            u1=ch_i[..., PC.U1],
            u2=ch_i[..., PC.U2],
            conic=ch_i[..., PC.CONIC],
            opacity=ch_i[..., PC.OPACITY],
            depth=ch_i[..., PC.DEPTH],
            feat=ch_i[..., PC.FEAT0:PC.FEAT0 + C],
            pix_rect=ch_i[..., PC.rect(C)].astype(jnp.int32),
            valid=valid & (ch_i[..., PC.validf(C)] > 0.0),
        )
        alpha, pass_ = instance_alpha(ch, pix_dir, pix_x, pix_y, cfg)
        carry = composite_chunk(carry, (alpha, pass_, ch.feat, ch.depth), cfg)
        return carry, None

    (T, _done, color, depth), _ = jax.lax.scan(step, init, (inst_c, valid_c))
    return CompositeOut(color=color, depth=depth, final_T=T)


def pixel_rays(rows: jnp.ndarray, cols: jnp.ndarray, beams: jnp.ndarray, W: int):
    """Unit ray dirs for integer pixel coords (forward.cu:589-591):
    alpha = beams[H-1-row], beta = -(col - W/2)/W * 2*pi."""
    H = beams.shape[0]
    alp = beams[H - 1 - rows]
    beta = -(cols.astype(jnp.float32) - W / 2.0) / W * 2.0 * jnp.pi
    return jnp.stack(
        [jnp.cos(alp) * jnp.cos(beta), jnp.cos(alp) * jnp.sin(beta), jnp.sin(alp)],
        axis=-1,
    )
