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
    update_stats: bool = True,
    variant: str = "beam",
):
    """One optimization step over a batch of frames (mean loss)."""
    C = state.params["anchor"].shape[0]
    k = mcfg.n_offsets
    B = frames.gt_image.shape[0]
    proxy0 = jnp.zeros((B, C, k, 3), jnp.float32)

    def loss_fn(params, proxy_b):
        def one(frame, proxy):
            total, (out, ng, anchor_vis, lt) = frame_loss(
                params, proxy, state.valid, state.step, frame,
                bg, mcfg, rcfg, ocfg, variant,
            )
            aux = (
                anchor_vis,
                ng.neural_opacity,
                ng.sel_mask,
                out.visible,
                out.n_dropped,
                out.n_overflow,
                lt,
            )
            return total, aux

        totals, aux = jax.vmap(one)(frames, proxy_b)
        return jnp.mean(totals), aux

    (_, aux), (grads, proxy_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, proxy0)
    anchor_vis_b, neural_op_b, sel_mask_b, visible_b, dropped_b, overflow_b, lt_b = aux

    if update_stats:
        vis_anchor_b = anchor_vis_b & state.valid[None]              # [B, C]
        op_b = jnp.maximum(neural_op_b, 0.0)                         # [B, C, k]
        opacity_accum = state.opacity_accum + jnp.sum(
            jnp.where(vis_anchor_b, op_b.sum(-1), 0.0), axis=0
        )
        anchor_demon = state.anchor_demon + vis_anchor_b.sum(0).astype(jnp.float32)
        # sel_mask is anchor-major [B,C,k]; visible matches the splat shape
        # ([B,C,k] beam, flat [B,C*k] surfel) — flatten each before combining
        stat_mask_b = sel_mask_b.reshape(B, -1) & visible_b.reshape(B, -1)
        # mean-loss gradients are 1/B of per-frame sums; undo for the stats
        gnorm_b = (jnp.linalg.norm(proxy_grad, axis=-1) * B).reshape(B, -1)
        offset_grad_accum = state.offset_grad_accum + jnp.sum(
            jnp.where(stat_mask_b, gnorm_b, 0.0), axis=0
        )
        offset_denom = state.offset_denom + stat_mask_b.sum(0).astype(jnp.float32)
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
    loss_mean = jax.tree.map(jnp.mean, lt_b)
    metrics = StepMetrics(
        loss=loss_mean,
        n_anchors=jnp.sum(state.valid),
        n_visible=jnp.sum(visible_b[0]),
        n_dropped=jnp.max(dropped_b),
        n_overflow=jnp.max(overflow_b),
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
