"""Training loop: jitted step + densification statistics.

The analogue of the reference's per-iteration hot loop (train.py:110-260):
prefilter -> decode -> splat -> 5-term loss -> backward -> Adam, plus the
densification statistics (training_statis, gaussian_model.py:599-620). The
whole step is one jitted function; densify/prune runs host-side between
steps (models/densify.py) at the reference's update_interval.

The densification gradient signal: the reference packs per-pixel
||dL/d(unit-sphere mean)|| sums into viewspace_points.grad[:, 2]
(backward.cu:738-788). Here a zeros "sphere proxy" is added to the
unit-sphere means; its autodiff gradient gives dL/d(sphere mean) directly
(norm-of-sum — the sum-of-norms variant lands with the custom-VJP kernel).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, OptConfig, RasterConfig
from ..lidar.frames import LidarFrame
from ..models.field import AnchorField, render_field
from .losses import LossTerms, lidar_losses
from .optim import AdamState, adam_update, init_adam, lr_schedules


class TrainState(NamedTuple):
    params: dict
    opt: AdamState
    valid: jnp.ndarray               # [C] anchor liveness
    step: jnp.ndarray                # []
    # densification statistics (capacity-padded)
    opacity_accum: jnp.ndarray       # [C]
    anchor_demon: jnp.ndarray        # [C]
    offset_grad_accum: jnp.ndarray   # [C*k]
    offset_denom: jnp.ndarray        # [C*k]


def init_train_state(field: AnchorField, mcfg: ModelConfig) -> TrainState:
    C = field.params["anchor"].shape[0]
    k = mcfg.n_offsets
    return TrainState(
        params=field.params,
        opt=init_adam(field.params),
        valid=field.valid,
        step=jnp.zeros((), jnp.int32),
        opacity_accum=jnp.zeros((C,), jnp.float32),
        anchor_demon=jnp.zeros((C,), jnp.float32),
        offset_grad_accum=jnp.zeros((C * k,), jnp.float32),
        offset_denom=jnp.zeros((C * k,), jnp.float32),
    )


def make_optimizer(ocfg: OptConfig):
    return lr_schedules(ocfg)


class StepMetrics(NamedTuple):
    loss: LossTerms
    n_anchors: jnp.ndarray
    n_visible: jnp.ndarray
    n_dropped: jnp.ndarray
    n_overflow: jnp.ndarray


def frame_loss(
    params, proxy, valid, step, frame: LidarFrame,
    bg, mcfg: ModelConfig, rcfg: RasterConfig, ocfg: OptConfig,
    variant: str = "beam",
):
    """Per-frame render + 5-term loss (train.py:150-203). Shared by the
    single-frame step below and the data-parallel vmapped step
    (parallel/shard.py). `proxy` is the zeros densification-gradient probe
    added to the unit-sphere means (surfel: world means).

    variant="surfel" renders through the 2DGS surfel rasterizer and adds
    the 2DGS distortion + normal-consistency regularizers (the reference's
    surfel kernels compute those channels, surfel forward.cu:495-543, but
    its training glue was never released — weights follow the 2DGS paper,
    iteration-gated via ocfg.dist_from/normal_from)."""
    if variant == "surfel":
        from ..models.field import render_field_surfel
        from .losses import normal_consistency_loss

        out, ng, anchor_vis = render_field_surfel(
            params, valid, frame, mcfg, rcfg, bg, mean_proxy=proxy
        )
    else:
        out, ng, anchor_vis = render_field(
            params, valid, frame, mcfg, rcfg, bg, sphere_proxy=proxy
        )
    lt = lidar_losses(
        out.color, out.depth, frame.gt_image, ng.scaling[..., :2]
        if variant == "surfel" else ng.scaling, ng.mask,
        lambda_dssim=ocfg.lambda_dssim,
        raydrop_lambda=ocfg.raydrop_lambda,
        scale_reg=ocfg.scale_reg,
        grad_clip_x=ocfg.grad_clip_x,
        pixel_mask=frame.pixel_mask,
    )
    if variant == "surfel":
        dist_w = jnp.where(step >= ocfg.dist_from, ocfg.dist_lambda, 0.0)
        norm_w = jnp.where(step >= ocfg.normal_from, ocfg.normal_lambda, 0.0)
        hit = frame.gt_image[0]
        if frame.pixel_mask is not None:
            hit = hit * frame.pixel_mask
        dist_loss = jnp.sum(out.distortion * hit) / jnp.maximum(jnp.sum(hit), 1.0)
        nc_loss = normal_consistency_loss(
            out.normal, out.depth, frame.beams, frame.W, hit
        )
        lt = lt._replace(total=lt.total + dist_w * dist_loss + norm_w * nc_loss)
    if ocfg.overflow_lambda > 0:
        # Capacity-pressure regularizer (TPU-specific; see OptConfig).
        # pressure = truncated instances per decoded gaussian — 0 while the
        # tile budget holds, so the term is inert until truncation begins;
        # the gradient is a uniform downward force on every decoded
        # gaussian's opacity, whose magnitude tracks the overflow, so the
        # decoded set shrinks until it re-fits the budget (gaussians near
        # the sel>0 gate drop out first).
        n_sel = jnp.maximum(jnp.sum(ng.sel_mask.astype(jnp.float32)), 1.0)
        pressure = jax.lax.stop_gradient(
            out.n_overflow.astype(jnp.float32) / n_sel
        )
        op_mass = (
            jnp.sum(jnp.where(ng.sel_mask, ng.neural_opacity, 0.0)) / n_sel
        )
        lt = lt._replace(
            total=lt.total + ocfg.overflow_lambda * pressure * op_mass
        )
    return lt.total, (out, ng, anchor_vis, lt)


def train_step(
    state: TrainState,
    frame: LidarFrame,
    bg: jnp.ndarray,
    mcfg: ModelConfig,
    rcfg: RasterConfig,
    ocfg: OptConfig,
    update_stats: bool = True,
    variant: str = "beam",
):
    """One optimization step. Pure function of (state, frame); jit with
    static cfgs via functools.partial or Trainer below."""
    C = state.params["anchor"].shape[0]
    k = mcfg.n_offsets
    proxy0 = jnp.zeros((C, k, 3), jnp.float32)

    def loss_fn(params, proxy):
        return frame_loss(params, proxy, state.valid, state.step, frame,
                          bg, mcfg, rcfg, ocfg, variant)

    (_, (out, ng, anchor_vis, lt)), (grads, proxy_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, proxy0)

    # --- densification statistics (training_statis) ---
    if update_stats:
        vis_anchor = anchor_vis & state.valid                       # [C]
        op = jnp.maximum(ng.neural_opacity, 0.0)                    # [C,k]
        opacity_accum = state.opacity_accum + jnp.where(vis_anchor, op.sum(1), 0.0)
        anchor_demon = state.anchor_demon + vis_anchor.astype(jnp.float32)
        # sel_mask is anchor-major [C,k]; visible matches the splat shape
        # ([C,k] beam, flat [C*k] surfel) — flatten each before combining
        stat_mask = ng.sel_mask.reshape(-1) & out.visible.reshape(-1)  # [C*k]
        gnorm = jnp.linalg.norm(proxy_grad, axis=-1).reshape(-1)
        offset_grad_accum = state.offset_grad_accum + jnp.where(stat_mask, gnorm, 0.0)
        offset_denom = state.offset_denom + stat_mask.astype(jnp.float32)
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
        loss=lt,
        n_anchors=jnp.sum(state.valid),
        n_visible=jnp.sum(out.visible),
        n_dropped=out.n_dropped,
        n_overflow=out.n_overflow,
    )
    return new_state, metrics


@dataclass
class Trainer:
    """Host-side orchestration: owns the jitted step and the densify cadence
    (the reference's training() driver, train.py:86-260)."""

    mcfg: ModelConfig
    ocfg: OptConfig
    rcfg: RasterConfig
    bg: jnp.ndarray
    variant: str = "beam"                   # "beam" | "surfel"

    def __post_init__(self):
        self._step = jax.jit(
            partial(
                train_step,
                bg=self.bg, mcfg=self.mcfg, rcfg=self.rcfg, ocfg=self.ocfg,
                variant=self.variant,
            ),
            donate_argnums=(0,),
        )
        self._step_nostats = jax.jit(
            partial(
                train_step,
                bg=self.bg, mcfg=self.mcfg, rcfg=self.rcfg, ocfg=self.ocfg,
                update_stats=False, variant=self.variant,
            ),
            donate_argnums=(0,),
        )

    def render(self, params, valid, frame):
        """Variant-dispatched forward render (color/depth/occ interface)."""
        if self.variant == "surfel":
            from ..models.field import render_field_surfel

            return render_field_surfel(
                params, valid, frame, self.mcfg, self.rcfg, self.bg
            )[0]
        return render_field(
            params, valid, frame, self.mcfg, self.rcfg, self.bg
        )[0]

    def step(self, state: TrainState, frame: LidarFrame, iteration: int):
        collect = (
            iteration < self.ocfg.update_until
            and iteration > self.ocfg.start_stat
        )
        fn = self._step if collect else self._step_nostats
        return fn(state, frame)

    def densify(self, state: TrainState, key, voxel_size: float):
        """adjust_anchor at the reference cadence (train.py:246-247)."""
        from ..models.densify import densify_step

        return densify_step(
            state, key, self.mcfg, self.ocfg, float(voxel_size),
            check_interval=self.ocfg.update_interval,
        )

    def should_densify(self, state_n_anchors: int, iteration: int) -> bool:
        o = self.ocfg
        return (
            o.start_stat < iteration < o.update_until
            and state_n_anchors < self.mcfg.max_anchors
            and iteration > o.update_from
            and iteration % o.update_interval == 0
        )

    def should_maintain(self, iteration: int) -> bool:
        """Post-densify maintenance cadence: keep the prune-pass cov
        log-scale clamp alive after update_until (OptConfig
        scale_clamp_after_until — see the rationale there)."""
        o = self.ocfg
        return (
            o.scale_clamp_after_until
            and iteration >= o.update_until
            and iteration % o.update_interval == 0
        )

    def maintain(self, state: TrainState) -> TrainState:
        return _clamp_cov_scales(state)


@jax.jit
def _clamp_cov_scales(state: TrainState) -> TrainState:
    """The prune-pass clamp (gaussian_model.py:646-658) as a standalone
    transform: cov log-scales capped at 0.05, params only (the reference's
    clamp is a data write; Adam moments are untouched there too)."""
    p = dict(state.params)
    p["scaling"] = jnp.concatenate(
        [p["scaling"][:, :3], jnp.minimum(p["scaling"][:, 3:], 0.05)], axis=1
    )
    return state._replace(params=p)
