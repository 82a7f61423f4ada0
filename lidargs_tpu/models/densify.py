"""Anchor densification: gradient-driven growing + opacity pruning.

TPU-native re-design of the reference's adjust_anchor / anchor_growing /
prune_anchor (gaussian_model.py:677-830). The reference reallocates torch
tensors and performs Adam "state surgery"; here every array keeps its static
capacity and liveness is a `valid` mask:

  * growing writes new anchors into free (invalid) rows and zeroes their
    Adam moments — the equivalent of cat_tensors_to_optimizer
    (gaussian_model.py:551-597) as pure scatter ops;
  * the reference's `torch.unique` + O(N_sel * N_anchor) chunked duplicate
    scan (gaussian_model.py:711-726) becomes one stable multi-key
    `lax.sort` over [existing ++ selected] grid coordinates: a selected
    cell is kept iff its sorted predecessor has different coords (this
    simultaneously dedups selected cells and rejects cells already occupied
    by an anchor);
  * `torch_scatter.scatter_max` of candidate features per cell
    (gaussian_model.py:742) becomes jax.ops.segment_max over sorted-run
    segment ids;
  * pruning zeroes rows + clears `valid` instead of compacting.

Semantics preserved: 3 hierarchy levels with 2^i-scaled thresholds and
1-0.5^(i+1) random keep, voxel sizes voxel*16/4/1, new-anchor init
(log(cur_size) scales, identity rot, opacity=inv_sigmoid(0.9), zero
offsets), stat resets, the reference's log-scale clamp at 0.05 on prune.
The whole routine is jittable (called every update_interval steps).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, OptConfig
from ..train.trainer import TrainState

_COORD_SENTINEL_SEL = jnp.int32(2**30)
_COORD_SENTINEL_EXIST = jnp.int32(2**30 - 7)


class DensifyStats(NamedTuple):
    n_grown: jnp.ndarray
    n_pruned: jnp.ndarray
    n_capacity_dropped: jnp.ndarray


def _grow_level(
    state: TrainState,
    level: int,
    grads: jnp.ndarray,          # [C*k] mean gradient signal
    offset_mask: jnp.ndarray,    # [C*k]
    key,
    mcfg: ModelConfig,
    ocfg: OptConfig,
    voxel_size: float,
):
    params = state.params
    valid = state.valid
    C = params["anchor"].shape[0]
    k = mcfg.n_offsets
    # argsort-compaction below can produce at most C*k candidate rows, so a
    # larger configured cap would desync sel_* from the tag/row vectors
    S = min(mcfg.grow_src_cap, mcfg.anchor_capacity * k)
    G = mcfg.grow_cap_per_level

    cur_threshold = ocfg.densify_grad_threshold * (
        (mcfg.update_hierachy_factor // 2) ** level
    )
    cand = (grads >= cur_threshold) & offset_mask
    keep_p = 1.0 - 0.5 ** (level + 1)
    cand = cand & (jax.random.uniform(key, cand.shape) > (1.0 - keep_p))
    cand = cand & jnp.repeat(valid, k)

    size_factor = mcfg.update_init_factor // (mcfg.update_hierachy_factor**level)
    cur_size = voxel_size * size_factor

    # candidate positions = decoded gaussian centers (anchor + offset*scale)
    scaling = jnp.exp(params["scaling"][:, :3])
    xyz = (
        jnp.repeat(params["anchor"], k, axis=0)
        + params["offset"].reshape(C * k, 3) * jnp.repeat(scaling, k, axis=0)
    )

    # compact candidates to S rows
    order = jnp.argsort(~cand, stable=True)[:S]
    sel_ok = jnp.take(cand, order)
    sel_xyz = jnp.take(xyz, order, axis=0)
    sel_feat = jnp.take(jnp.repeat(params["feat"], k, axis=0), order, axis=0)
    n_dropped_src = jnp.sum(cand) - jnp.sum(sel_ok)

    sel_coords = jnp.round(sel_xyz / cur_size).astype(jnp.int32)
    sel_coords = jnp.where(sel_ok[:, None], sel_coords, _COORD_SENTINEL_SEL)
    exist_coords = jnp.round(params["anchor"] / cur_size).astype(jnp.int32)
    exist_coords = jnp.where(valid[:, None], exist_coords, _COORD_SENTINEL_EXIST)

    # merged stable sort: existing first within equal coords (tag key)
    coords = jnp.concatenate([exist_coords, sel_coords], axis=0)      # [C+S,3]
    tag = jnp.concatenate(
        [jnp.zeros((C,), jnp.int32), jnp.ones((S,), jnp.int32)]
    )
    row = jnp.concatenate(
        [jnp.full((C,), S, jnp.int32), jnp.arange(S, dtype=jnp.int32)]
    )
    c1, c2, c3, tag_s, row_s = jax.lax.sort(
        (coords[:, 0], coords[:, 1], coords[:, 2], tag, row),
        num_keys=4,
        is_stable=True,
    )
    same_prev = (
        (c1 == jnp.roll(c1, 1)) & (c2 == jnp.roll(c2, 1)) & (c3 == jnp.roll(c3, 1))
    )
    same_prev = same_prev.at[0].set(False)
    is_sel = tag_s == 1
    sel_not_sentinel = c1 != _COORD_SENTINEL_SEL
    keep = is_sel & ~same_prev & sel_not_sentinel                     # new cells

    # segment ids over coord runs -> scatter_max of candidate features
    seg_id = jnp.cumsum((~same_prev).astype(jnp.int32)) - 1           # [C+S]
    feat_sorted = jnp.where(
        is_sel[:, None],
        jnp.take(sel_feat, jnp.minimum(row_s, S - 1), axis=0),
        -jnp.inf,
    )
    seg_feat = jax.ops.segment_max(feat_sorted, seg_id, num_segments=C + S)
    new_feat_sorted = seg_feat[seg_id]                                # [C+S,F]

    # allocate free rows for kept cells
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1                     # [C+S]
    free_rows = jnp.nonzero(~valid, size=G, fill_value=C)[0]          # [G]
    slot = jnp.where(
        keep & (rank < G), free_rows[jnp.clip(rank, 0, G - 1)], C
    )                                                                  # C = drop
    n_grown = jnp.sum(slot < C)
    n_cap_dropped = jnp.sum(keep) - n_grown + n_dropped_src

    new_anchor = (
        jnp.stack([c1, c2, c3], -1).astype(jnp.float32) * cur_size
    )
    log_size = jnp.log(jnp.asarray(cur_size, jnp.float32))
    inv_sig_09 = jnp.log(0.9 / 0.1)

    p = dict(params)
    p["anchor"] = params["anchor"].at[slot].set(new_anchor, mode="drop")
    p["scaling"] = params["scaling"].at[slot].set(
        jnp.full((C + S, 6), log_size), mode="drop"
    )
    p["rotation"] = params["rotation"].at[slot].set(
        jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (C + S, 1)), mode="drop"
    )
    p["opacity"] = params["opacity"].at[slot].set(
        jnp.full((C + S, 1), inv_sig_09), mode="drop"
    )
    p["feat"] = params["feat"].at[slot].set(
        jnp.maximum(new_feat_sorted, -1e30), mode="drop"
    )
    p["offset"] = params["offset"].at[slot].set(
        jnp.zeros((C + S, k, 3), jnp.float32), mode="drop"
    )
    new_valid = valid.at[slot].set(True, mode="drop")

    # zero Adam moments of the new rows (cat_tensors_to_optimizer semantics)
    mu, nu = state.opt.mu, state.opt.nu
    for name in ("anchor", "scaling", "rotation", "opacity", "feat", "offset"):
        zeros = jnp.zeros((C + S,) + params[name].shape[1:], params[name].dtype)
        mu = {**mu, name: mu[name].at[slot].set(zeros, mode="drop")}
        nu = {**nu, name: nu[name].at[slot].set(zeros, mode="drop")}

    # zero stats of the new rows
    zeros_a = jnp.zeros((C + S,), jnp.float32)
    opacity_accum = state.opacity_accum.at[slot].set(zeros_a, mode="drop")
    anchor_demon = state.anchor_demon.at[slot].set(zeros_a, mode="drop")
    off_slot = (slot[:, None] * k + jnp.arange(k)[None, :]).reshape(-1)
    off_slot = jnp.where(off_slot < C * k, off_slot, C * k)
    zeros_o = jnp.zeros(((C + S) * k,), jnp.float32)
    offset_grad_accum = state.offset_grad_accum.at[off_slot].set(zeros_o, mode="drop")
    offset_denom = state.offset_denom.at[off_slot].set(zeros_o, mode="drop")

    new_state = state._replace(
        params=p,
        opt=state.opt._replace(mu=mu, nu=nu),
        valid=new_valid,
        opacity_accum=opacity_accum,
        anchor_demon=anchor_demon,
        offset_grad_accum=offset_grad_accum,
        offset_denom=offset_denom,
    )
    return new_state, n_grown, n_cap_dropped


@partial(
    jax.jit,
    static_argnames=("mcfg", "ocfg", "voxel_size", "check_interval"),
)
def densify_step(
    state: TrainState,
    key,
    mcfg: ModelConfig,
    ocfg: OptConfig,
    voxel_size: float,
    check_interval: int = 100,
):
    """adjust_anchor (gaussian_model.py:776-830): grow over 3 hierarchy
    levels, reset stats, prune low-opacity anchors."""
    C = state.params["anchor"].shape[0]
    k = mcfg.n_offsets

    grads = state.offset_grad_accum / jnp.maximum(state.offset_denom, 1e-20)
    grads = jnp.where(state.offset_denom > 0, grads, 0.0)
    offset_mask = state.offset_denom > check_interval * ocfg.success_threshold

    st = state
    total_grown = jnp.zeros((), jnp.int32)
    total_dropped = jnp.zeros((), jnp.int32)
    keys = jax.random.split(key, mcfg.update_depth)
    for level in range(mcfg.update_depth):
        st, n_grown, n_drop = _grow_level(
            st, level, grads, offset_mask, keys[level], mcfg, ocfg, voxel_size
        )
        total_grown = total_grown + n_grown.astype(jnp.int32)
        total_dropped = total_dropped + n_drop.astype(jnp.int32)

    # --- stat reset for offsets that passed the success threshold ---
    offset_grad_accum = jnp.where(offset_mask, 0.0, st.offset_grad_accum)
    offset_denom = jnp.where(offset_mask, 0.0, st.offset_denom)

    # --- prune (gaussian_model.py:798-830) ---
    visited = st.anchor_demon > check_interval * ocfg.success_threshold
    prune = (
        st.valid
        & visited
        & (st.opacity_accum < ocfg.min_opacity * st.anchor_demon)
    )
    new_valid = st.valid & ~prune

    # reset stats of well-visited survivors; clear pruned rows entirely
    opacity_accum = jnp.where(visited | prune, 0.0, st.opacity_accum)
    anchor_demon = jnp.where(visited | prune, 0.0, st.anchor_demon)
    prune_off = jnp.repeat(prune, k)
    offset_grad_accum = jnp.where(prune_off, 0.0, offset_grad_accum)
    offset_denom = jnp.where(prune_off, 0.0, offset_denom)

    # zero params/moments of pruned rows (keeps padded-row invariants)
    p = dict(st.params)
    mu, nu = dict(st.opt.mu), dict(st.opt.nu)
    for name in ("anchor", "scaling", "rotation", "opacity", "feat", "offset"):
        shape_tail = (1,) * (p[name].ndim - 1)
        m = prune.reshape((-1,) + shape_tail)
        p[name] = jnp.where(m, 0.0, p[name])
        mu[name] = jnp.where(m, 0.0, mu[name])
        nu[name] = jnp.where(m, 0.0, nu[name])
    # the reference's log-scale clamp on prune (gaussian_model.py:646-658)
    cov_scale = p["scaling"][:, 3:]
    p["scaling"] = jnp.concatenate(
        [p["scaling"][:, :3], jnp.minimum(cov_scale, 0.05)], axis=1
    )

    new_state = st._replace(
        params=p,
        opt=st.opt._replace(mu=mu, nu=nu),
        valid=new_valid,
        opacity_accum=opacity_accum,
        anchor_demon=anchor_demon,
        offset_grad_accum=offset_grad_accum,
        offset_denom=offset_denom,
    )
    stats = DensifyStats(
        n_grown=total_grown,
        n_pruned=jnp.sum(prune),
        n_capacity_dropped=total_dropped,
    )
    return new_state, stats
