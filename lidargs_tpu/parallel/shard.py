"""Data-parallel training step over a frame batch.

Net-new distributed layer (the reference trains one frame per step on one
GPU, SURVEY.md §2.3). SPMD design, not NCCL translation:

  * params replicated, frame batch sharded over the 'data' mesh axis
    (in_shardings); the per-frame render/loss is a vmap, so XLA partitions
    the batch and inserts the gradient all-reduce (psum over 'data')
    automatically, overlapping it with backward compute on ICI.
  * densification statistics are batch-reduced exactly as running the
    reference loop B times: visit counts and gradient-norm sums add per
    frame (per-frame sphere proxies keep the signal exact).
  * single-frame renders can additionally shard tile lists over the 'tile'
    axis (ops/rasterize.py tile_spec).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, OptConfig, ParallelConfig, RasterConfig
from ..lidar.frames import LidarFrame
from ..train.optim import adam_update, lr_schedules
from ..train.trainer import StepMetrics, Trainer, TrainState, frame_loss


def dp_train_step(
    state: TrainState,
    frames: LidarFrame,          # stacked: every leaf has leading batch dim
    bg: jnp.ndarray,
    mcfg: ModelConfig,
    rcfg: RasterConfig,
    ocfg: OptConfig,
    mesh: Mesh,
    data_axis: str = "data",
    update_stats: bool = True,
    variant: str = "beam",
):
    """One optimization step over a batch of frames (mean loss).

    Structure (r5): the per-frame loss runs inside a `shard_map` over the
    'data' mesh axis, with a SEQUENTIAL `lax.map` over each shard's local
    frames, and explicit `lax.psum` collectives for the gradient and
    statistics reductions. Two reasons over the previous global
    vmap-under-jit:

      * correctness on real TPU slices — a batch-vmapped pallas kernel
        adds a leading dim to its smem operands and fails Mosaic's block
        rule (`(Squeezed, Tl)` block over an `[B, Tl]` array; found by the
        AOT v5e:2x4 compile, tools/dp_overlap_hlo.py), and XLA does not
        partition the custom-call anyway. Inside shard_map the kernel
        always sees unbatched local shapes.
      * the collectives are explicit and minimal: ONE fused grad psum
        (plus the O(C) stats psums) per step, placed after the local
        backward, exactly what DESIGN §8's overlap projection assumes.

    Sequential-over-local-frames loses nothing: one frame already
    saturates the chip, and per-device batches are small.
    """
    C = state.params["anchor"].shape[0]
    k = mcfg.n_offsets
    B = frames.gt_image.shape[0]
    from jax import shard_map

    fspec = jax.tree.map(lambda _: P(data_axis), frames)
    repl = P()

    @partial(
        shard_map, mesh=mesh,
        in_specs=(repl, repl, repl, fspec),
        out_specs=repl,
        check_vma=False,
    )
    def shard_grads(params, valid, step_no, frames_l):
        Bl = frames_l.gt_image.shape[0]
        proxy0 = jnp.zeros((Bl, C, k, 3), jnp.float32)

        def local_loss(p, proxy_l):
            def one(fp):
                frame, proxy = fp
                total, (out, ng, anchor_vis, lt) = frame_loss(
                    p, proxy, valid, step_no, frame,
                    bg, mcfg, rcfg, ocfg, variant,
                )
                return total, (
                    anchor_vis, ng.neural_opacity, ng.sel_mask,
                    out.visible, out.n_dropped, out.n_overflow, lt,
                )

            totals, aux = jax.lax.map(one, (frames_l, proxy_l))
            # SUM of local losses: grads are per-frame-exact sums; the
            # global mean's 1/B is applied after the psum
            return jnp.sum(totals), aux

        (_, aux), (g, proxy_grad) = jax.value_and_grad(
            local_loss, argnums=(0, 1), has_aux=True
        )(params, proxy0)
        (anchor_vis_b, neural_op_b, sel_mask_b, visible_b, dropped_b,
         overflow_b, lt_b) = aux

        psum = lambda x: jax.lax.psum(x, data_axis)
        grads = jax.tree.map(lambda x: psum(x) / B, g)

        # --- densification statistics (batch-reduced, per-frame exact:
        # proxy grads differentiate a SUM, so no 1/B undo is needed) ---
        vis_anchor_b = anchor_vis_b & valid[None]                  # [Bl, C]
        op_b = jnp.maximum(neural_op_b, 0.0)                       # [Bl,C,k]
        d_opacity = psum(jnp.sum(
            jnp.where(vis_anchor_b, op_b.sum(-1), 0.0), axis=0))
        d_demon = psum(vis_anchor_b.sum(0).astype(jnp.float32))
        # sel_mask is anchor-major [Bl,C,k]; visible matches the splat
        # shape ([Bl,C,k] beam, flat [Bl,C*k] surfel)
        stat_mask_b = (sel_mask_b.reshape(Bl, -1)
                       & visible_b.reshape(Bl, -1))
        gnorm_b = jnp.linalg.norm(proxy_grad, axis=-1).reshape(Bl, -1)
        d_offset_grad = psum(jnp.sum(
            jnp.where(stat_mask_b, gnorm_b, 0.0), axis=0))
        d_offset_denom = psum(stat_mask_b.sum(0).astype(jnp.float32))

        loss_sum = jax.tree.map(lambda x: psum(jnp.sum(x)) / B, lt_b)
        n_visible = jax.lax.pmax(
            jnp.sum(visible_b[0]), data_axis)
        n_dropped = jax.lax.pmax(jnp.max(dropped_b), data_axis)
        n_overflow = jax.lax.pmax(jnp.max(overflow_b), data_axis)
        return (grads, d_opacity, d_demon, d_offset_grad, d_offset_denom,
                loss_sum, n_visible, n_dropped, n_overflow)

    (grads, d_opacity, d_demon, d_offset_grad, d_offset_denom, loss_mean,
     n_visible, n_dropped, n_overflow) = shard_grads(
        state.params, state.valid, state.step, frames)

    if update_stats:
        opacity_accum = state.opacity_accum + d_opacity
        anchor_demon = state.anchor_demon + d_demon
        offset_grad_accum = state.offset_grad_accum + d_offset_grad
        offset_denom = state.offset_denom + d_offset_denom
    else:
        opacity_accum = state.opacity_accum
        anchor_demon = state.anchor_demon
        offset_grad_accum = state.offset_grad_accum
        offset_denom = state.offset_denom

    schedules = lr_schedules(ocfg)
    new_params, new_opt = adam_update(
        state.params, grads, state.opt, schedules, state.step, ocfg
    )
    new_state = TrainState(
        params=new_params,
        opt=new_opt,
        valid=state.valid,
        step=state.step + 1,
        opacity_accum=opacity_accum,
        anchor_demon=anchor_demon,
        offset_grad_accum=offset_grad_accum,
        offset_denom=offset_denom,
    )
    metrics = StepMetrics(
        loss=loss_mean,
        n_anchors=jnp.sum(state.valid),
        n_visible=n_visible,
        n_dropped=n_dropped,
        n_overflow=n_overflow,
    )
    return new_state, metrics


def make_dp_trainer(
    mesh: Mesh,
    mcfg: ModelConfig,
    rcfg: RasterConfig,
    ocfg: OptConfig,
    bg: jnp.ndarray,
    pcfg: ParallelConfig = ParallelConfig(),
    update_stats: bool = True,
    variant: str = "beam",
):
    """Jitted data-parallel step: state replicated, frames sharded on
    'data'. Returns fn(state, stacked_frames) -> (state, metrics)."""
    repl = NamedSharding(mesh, P())
    fsh = NamedSharding(mesh, P(pcfg.data_axis))

    step = jax.jit(
        partial(dp_train_step, bg=bg, mcfg=mcfg, rcfg=rcfg, ocfg=ocfg,
                mesh=mesh, data_axis=pcfg.data_axis,
                update_stats=update_stats, variant=variant),
        in_shardings=(repl, fsh),
        donate_argnums=(0,),
    )
    return step


@dataclass
class DPTrainer(Trainer):
    """Data-parallel Trainer: same interface (step/densify/render), but
    `step` consumes a stacked frame batch sharded over the mesh 'data'
    axis. Works over a single-process mesh (the CLI's --data_parallel) or
    a multi-host global mesh (parallel/runtime.py) — the jitted step and
    its gradient psum are identical in both; only array assembly differs.
    """

    mesh: Optional[Mesh] = None
    pcfg: ParallelConfig = field(default_factory=ParallelConfig)

    def __post_init__(self):
        assert self.mesh is not None, "DPTrainer needs a mesh"
        kw = dict(mcfg=self.mcfg, rcfg=self.rcfg, ocfg=self.ocfg,
                  bg=self.bg, pcfg=self.pcfg, variant=self.variant)
        self._step = make_dp_trainer(self.mesh, **kw)
        self._step_nostats = make_dp_trainer(self.mesh, update_stats=False,
                                             **kw)
