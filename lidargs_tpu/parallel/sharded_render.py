"""Gaussian- and tile-sharded rendering via shard_map (multi-chip).

Net-new distributed design (the reference is single-GPU, SURVEY.md §2.3),
BASELINE config[4]: within one frame,

  * the anchor field is SHARDED over the mesh axis: each device decodes and
    projects only its anchor shard (the parameter- and FLOP-heavy stage:
    MLP heads + per-gaussian preprocess);
  * the packed per-gaussian render state ([V, F] wide rows, ~25 MB at the
    reference scale) is ALL-GATHERED over ICI — the one collective of the
    forward pass; its autodiff transpose is a reduce-scatter of the packed
    gradients, which XLA overlaps with the backward compute;
  * the range image's tiles are SHARDED: each device bins and composites
    only its contiguous tile window (ops/rasterize.py render_packed_window)
    — tiles are independent after binning, so compositing needs no
    communication at all;
  * output strips concatenate over the axis into the full range image.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig, RasterConfig
from ..lidar.frames import LidarFrame
from ..models.field import generate_neural_gaussians, prefilter_anchors
from ..ops.projection import PackedCols, pack_splats, preprocess_gaussians
from ..ops.rasterize import RenderOut, render_packed_window


def _param_specs(params: dict, axis: str):
    """Anchor-indexed arrays shard over `axis`; MLP heads replicate."""
    anchor_keys = {"anchor", "offset", "feat", "scaling", "rotation", "opacity"}
    return {
        k: (P(axis) if k in anchor_keys else P())
        for k in params
    }


def render_field_sharded(
    params: dict,
    valid: jnp.ndarray,
    frame: LidarFrame,
    mcfg: ModelConfig,
    rcfg: RasterConfig,
    bg: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tile",
) -> RenderOut:
    """Single-frame render with anchors + tiles sharded over `axis`.
    Numerically identical to render_field(...)'s forward output (the
    all-gather preserves the global anchor order, so the depth presort and
    instance keys match the single-device path exactly)."""
    H, W = frame.H, frame.W
    gy, gx = rcfg.grid_shape(H, W)
    T = gy * gx
    D = mesh.shape[axis]
    Cap = params["anchor"].shape[0]
    if Cap % D != 0:
        raise ValueError(f"anchor capacity {Cap} not divisible by mesh axis {D}")
    Tl = -(-T // D)                 # per-device tile window (last may overhang)
    C = mcfg.color_channel

    # one flatten at the projection boundary, like render_field (DESIGN §13)
    fl = lambda x: x.reshape((-1,) + x.shape[2:])

    def shard_fn(params_l, valid_l, frame):
        dev = jax.lax.axis_index(axis)
        anchor_vis = prefilter_anchors(params_l, valid_l, frame, rcfg)
        ng = generate_neural_gaussians(
            params_l, valid_l, anchor_vis, frame.center, mcfg, cam_uid=frame.uid
        )
        splats = preprocess_gaussians(
            fl(ng.xyz), fl(ng.scaling), fl(ng.rot),
            fl(ng.opacity), fl(ng.feat), fl(ng.mask),
            frame.w2s_rot, frame.w2s_trans, frame.beams, frame.W, rcfg,
        )
        pk_l = pack_splats(splats)                        # [P/D, F]
        # one collective: gather every device's packed splats (order =
        # global anchor order, so downstream matches the single-chip path)
        pk = jax.lax.all_gather(pk_l, axis, axis=0, tiled=True)   # [P, F]

        Pn = pk.shape[0]
        V = min(rcfg.max_visible, Pn)
        depth = pk[:, PackedCols.DEPTH]
        _, sel = jax.lax.sort(
            (depth, jnp.arange(Pn, dtype=jnp.int32)), num_keys=1, is_stable=True
        )
        pkv = jnp.take(pk, sel[:V], axis=0, mode="clip")
        vvalid = pkv[:, PackedCols.validf(C)] > 0.0
        n_dropped = jnp.sum(depth < 4.0 * rcfg.far) - jnp.sum(vvalid)

        color_t, depth_t, final_T_t, n_overflow = render_packed_window(
            pkv, frame.beams, frame.W, rcfg, C, tile_lo=dev * Tl, n_tiles=Tl
        )
        return (color_t, depth_t, final_T_t, splats.valid,
                n_dropped[None], n_overflow[None])

    pspec = _param_specs(params, axis)
    out_specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis))
    color_t, depth_t, final_T_t, visible, n_dropped, n_overflow = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(pspec, P(axis), P()),
        out_specs=out_specs,
        check_vma=False,
    )(params, valid, frame)

    # --- assemble strips (D*Tl tiles, window overhang dropped) ---
    th, tw = rcfg.tile_h, rcfg.tile_w
    color_t, depth_t, final_T_t = (
        x[:T] for x in (color_t, depth_t, final_T_t)
    )
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
        visible=visible,
        n_dropped=n_dropped[0],
        n_overflow=jnp.sum(n_overflow),
    )
