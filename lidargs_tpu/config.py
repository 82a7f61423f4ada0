"""Dataclass configuration for the whole framework.

Replaces the reference's reflection-based argparse groups
(`arguments/__init__.py:47-161` in /root/reference) with typed dataclasses.
Defaults mirror the reference's published defaults exactly so that training
runs are comparable.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class RasterConfig:
    """Static configuration of the range-view rasterizer.

    The reference hard-codes NUM_CHANNELS=2 / BLOCK 16x1 at CUDA compile time
    (`config.h:15-17`) and Ray_Divergence_Angle=0.002 (`forward.cu:22`). Here
    everything is a jit-static dataclass field.

    TPU-specific capacity knobs (the reference allocates dynamically; XLA
    needs static shapes): `max_visible` bounds the number of gaussians kept
    after culling, `max_tiles_per_gaussian` bounds the per-gaussian tile
    rect, `tile_capacity` bounds depth-sorted instances composited per tile.
    Overflow is counted and reported, never silently wrong for the survivors.
    """

    channels: int = 2                       # intensity + raydrop
    # tile_h: pixel rows per physical tile (1/2/4/8; the kernel ops span
    # tile_h * 128 lanes). MEASURED on v5e (tools/bench_render_ab.py, r4,
    # 64x2650 bench): wider tiles collapse duplicate instance emission —
    # one instance where h1 emits up to tile_h — so they win on BOTH speed
    # and truncation error vs a 2x-capacity golden. Gated frontier:
    # h4/K512/cap4 10.33 ms MAE 1.68e-2 (base 16.39 ms MAE 1.73e-2),
    # h4/K640/cap4 11.15/1.03e-2, h4/K768/cap8 12.40/6.18e-3,
    # h8/K1024/cap4 13.48/5.40e-3. The conservative reference-shaped h1
    # stays the dataclass default; bench.py autotunes, and the CLI maps
    # --tile_h/--tile_capacity/--max_tiles_per_gaussian onto these knobs.
    tile_h: int = 1                         # pixel rows per physical tile
    tile_w: int = 128                       # pixel cols per physical tile (lane dim)
    ref_block_x: int = 16                   # reference's virtual tiling, used for
    ref_block_y: int = 1                    # bit-parity pixel-rect masking
    ray_divergence_angle: float = 0.002
    near: float = 0.0
    far: float = 80.0
    # --- surfel (2DGS) variant (surfel auxiliary.h:18-39, forward.cu:18) ---
    surfel_ray_divergence_angle: float = 0.006
    surfel_near: float = 0.2                # near_n: per-instance depth cull
    surfel_far: float = 80.0                # far_n: distortion-loss mapping
    filter_inv_square: float = 2.0          # 2D low-pass fallback strength
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1e-4
    alpha_clamp: float = 0.99
    lowpass: float = 0.01                   # added to cov2d diagonal pre 1/d^2
    # --- static capacities (TPU) ---
    # compact-then-decode (render/eval path only): gather the prefiltered
    # anchors to this static capacity BEFORE the MLP decode, so the decode
    # + projection + cull run on the ~visible subset instead of the full
    # anchor capacity. 0 = off (every anchor decodes, the training path).
    # Anchors beyond the cap are dropped farthest-last-in-sort and counted
    # into n_dropped (never silent). The gather's VJP is the cheap
    # permutation-gather (rasterize.permutation_rows), but the training
    # step keeps this off: densification statistics are indexed by the
    # full anchor table.
    # MEASURED at the bench scene (v5e, r4): a LOSS — +0.7 ms and MAE
    # 3.2e-2 at cap 40960, because the synthetic visible-shell scene keeps
    # >40k of 60k anchors prefilter-visible (cap drops real anchors, and a
    # bigger cap saves too little). Stays an opt-in for real street scenes
    # where the visible fraction is ~50% or less (street fixture: ~46%).
    visible_anchor_cap: int = 0
    max_visible: int = 2 ** 18              # gaussians after cull-compaction
    max_tiles_per_gaussian: int = 32        # per-gaussian tile rect cap
    tile_capacity: int = 512                # sorted instances composited / tile
    chunk: int = 16                         # instances per compositing scan step
    # binning-sort key budget: total (gaussian, tile) instances emitted via
    # rank-search expansion (rasterize.py bin_instances). 0/-1 = the exact
    # dense [V, cap] grid (no instance drop). A positive budget sorts E
    # keys instead of V*cap — worthwhile when E comfortably covers the
    # true instance total (watch n_overflow: slots are emitted in depth
    # order, so budget overflow drops the FARTHEST gaussians' instances,
    # a worse policy than the per-tile nearest-K cap). At the bench
    # workload the true total is ~10x V (1x128 tiles: row extent
    # dominates), so ~12*V is the zero-drop budget there.
    # MEASURED on v5e (tools/bench_binning_ab.py, r3): the rank-search
    # emission LOSES badly on TPU — 12V budget renders 390 ms vs 16 ms
    # dense at the 64x2650 bench. The [E]-sized emission gathers + the
    # larger sort row count swamp the key savings; dense stays default.
    instance_capacity: int = 0
    # --- compositing backend ---
    # "auto": pallas kernels on TPU (when the tiling matches the kernel's
    # 1x128 lane layout), XLA scan elsewhere; "pallas" forces the kernels
    # (interpret mode off-TPU — slow, for tests); "xla" forces the scan.
    backend: str = "auto"
    # instances per kernel loop step; 128 amortizes while_loop overhead
    # best on v5e (sweep: 16->30.9ms, 32->26.5, 64->24.7, 128->24.0 full-
    # frame fwd); early exit still fires at chunk granularity
    pallas_chunk: int = 128
    # tiles per pallas grid step (each keeps its own trip count + early
    # exit; tile count padded up to a multiple). Measured neutral on v5e
    # (15.98/15.89/15.90/16.68 ms at 1/2/4/8) — Mosaic's grid pipelining
    # already hides per-step setup, so the kernel is VPU-compute-bound
    pallas_tiles_per_block: int = 1
    # fuse the per-tile instance gather into the pallas kernel: instead of
    # materializing [T, K, F] through an XLA row gather, the kernel DMAs
    # each tile's contiguous window of the dense depth-sorted instance
    # buffer (beam path only; requires the pallas backend).
    # MEASURED on v5e (r3): a consistent ~1.7-5.5 ms/frame LOSS vs the
    # XLA row gather at every tiling tried (dense 16.0->17.8 ms,
    # h2/K384 11.8->17.3 ms) — XLA's gather pipelines better than the
    # kernel's serial window DMAs. Stays default-off.
    fused_gather: bool = False
    # rematerialize the per-gaussian projection in the backward instead of
    # storing its ~20 [P]-sized intermediates: the projection is ~100
    # elementwise flops/gaussian, so recompute is HBM-cheaper than the
    # residual round-trip whenever the step is bandwidth-bound. Candidate
    # from the r4 --grad-prefix split (projection autodiff ~3 ms of the
    # 31 ms default step); measured via bench_train_step "+rematproj".
    remat_projection: bool = False
    # hand-derived single-pass projection VJP (projection.py
    # preprocess_gaussians_hv): saves only the inputs and fuses recompute +
    # every cotangent accumulation into one backward pass — no narrow
    # residual materializations (autodiff: ~4.4 ms fwd+bwd vs ~0.8 ms fwd
    # inside the default step, r5 --grad-prefix). Exact vs autodiff
    # (tests/test_projection_vjp.py, f64 to 1e-12) except the beams table,
    # which gets zero cotangent (fixed sensor calibration, never trained).
    # Beam path only; ignored when remat_projection is set (checkpoint
    # wraps the plain function).
    projection_hand_vjp: bool = True

    def grid_shape(self, H: int, W: int) -> Tuple[int, int]:
        return (-(-H // self.tile_h), -(-W // self.tile_w))

    def num_tiles(self, H: int, W: int) -> int:
        gy, gx = self.grid_shape(H, W)
        return gy * gx


@dataclass(frozen=True)
class ModelConfig:
    """Neural Gaussian Field hyper-parameters (reference ModelParams,
    `arguments/__init__.py:47-86`)."""

    feat_dim: int = 32
    n_offsets: int = 6
    color_channel: int = 2                  # intensity + raydrop
    voxel_size: float = 0.0                 # <=0: median 3-NN distance
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierachy_factor: int = 4
    use_feat_bank: bool = False
    appearance_dim: int = 0
    ratio: int = 1
    add_opacity_dist: bool = True
    add_cov_dist: bool = True
    add_color_dist: bool = True
    mlp_hidden: int = 32
    # TPU: anchor arrays are padded to a static capacity; growing beyond it
    # re-materialises at the next power-of-two multiple of this step.
    anchor_capacity: int = 2 ** 17
    max_anchors: int = 1_200_000            # densify_until_num_points
    # densification capacities (static): candidates compacted per level, and
    # max anchors grown per level per call
    grow_src_cap: int = 2 ** 16
    grow_cap_per_level: int = 2 ** 13


@dataclass(frozen=True)
class LrSchedule:
    init: float = 0.0
    final: float = 0.0
    delay_steps: int = 0
    delay_mult: float = 0.01
    max_steps: int = 10_000


@dataclass(frozen=True)
class OptConfig:
    """Optimization params (reference OptimizationParams,
    `arguments/__init__.py:95-161`)."""

    iterations: int = 10_000
    anchor_lr: LrSchedule = field(default_factory=lambda: LrSchedule(0.0, 0.0))
    offset_lr: LrSchedule = field(default_factory=lambda: LrSchedule(0.005, 1e-5))
    feature_lr: float = 0.005
    opacity_lr: float = 0.02
    scaling_lr: float = 0.007
    rotation_lr: float = 0.002
    mlp_opacity_lr: LrSchedule = field(default_factory=lambda: LrSchedule(0.002, 2e-4))
    mlp_cov_lr: LrSchedule = field(default_factory=lambda: LrSchedule(0.004, 4e-4))
    mlp_color_lr: LrSchedule = field(default_factory=lambda: LrSchedule(0.008, 5e-5))
    mlp_raydrop_lr: LrSchedule = field(default_factory=lambda: LrSchedule(0.008, 5e-5))
    mlp_featurebank_lr: LrSchedule = field(default_factory=lambda: LrSchedule(0.001, 1e-5))
    appearance_lr: LrSchedule = field(default_factory=lambda: LrSchedule(0.05, 5e-5))
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    raydrop_lambda: float = 10.0            # 10 waymo / 1 kitti (train.py:164)
    scale_reg: float = 0.01
    grad_clip_x: float = 0.01
    # densification
    start_stat: int = 500
    update_from: int = 500
    update_interval: int = 100
    update_until: int = 7000
    min_opacity: float = 0.005
    success_threshold: float = 0.1
    densify_grad_threshold: float = 5e-4
    depth_max: float = 80.0
    depth_min: float = 5.0                  # kitti 1 / waymo 5
    adam_eps: float = 1e-15
    # surfel (2DGS) regularizers — net-new (the reference's surfel training
    # glue is unreleased); weights/gating follow the 2DGS paper scaled to
    # the 10k-iteration default schedule
    dist_lambda: float = 100.0
    normal_lambda: float = 0.05
    dist_from: int = 1000
    normal_from: int = 2000
    # Keep the prune-pass cov log-scale clamp (gaussian_model.py:646-658,
    # min(scaling, 0.05) on the cov columns) running at the update_interval
    # cadence AFTER update_until. The reference stops clamping when prune
    # stops; on the street fixture the unclamped cov scales then grow
    # ~1 m -> 29 m, and with a static per-tile budget the bloated
    # near-depth gaussians hog every tile's nearest-K slots and evict the
    # real geometry (the late-training collapse). The reference's unbounded
    # per-tile lists merely get slower; ours corrupt — so the clamp stays on.
    scale_clamp_after_until: bool = True
    # capacity-pressure regularizer — net-new, TPU-specific (no reference
    # analogue: the CUDA rasterizer has unbounded per-tile lists,
    # rasterizer_impl.cu:70-112). When the rasterizer reports truncated
    # instances (n_overflow > 0), push the decoded set's positive opacities
    # down in proportion to the measured pressure so the model re-fits the
    # budget. OFF by default: steady farthest-first truncation is usually
    # benign (the dropped instances are occluded — a street-fixture run at
    # 17x over budget still trained well), and an always-on pressure term
    # over-shrinks the model (measured: visible 66k -> 580 at lambda=0.1).
    # The late-training runaway this was aimed at is actually driven by
    # unclamped cov scales and is fixed by scale_clamp_after_until; enable
    # this (~1e-3..1e-2) only for configs whose overflow grows without
    # bound AFTER that clamp.
    overflow_lambda: float = 0.0


@dataclass(frozen=True)
class DataConfig:
    source_path: str = ""
    data_label: str = "waymo"
    white_background: bool = False
    num_frames: int = 50
    init_points: int = 500_000
    resolution_scales: Tuple[float, ...] = (1.0,)


@dataclass(frozen=True)
class ParallelConfig:
    """Net-new distributed layer (the reference is single-GPU, SURVEY §2.3).

    data_axis shards frames (batch) across devices; tile_axis shards the
    range image's azimuth tiles within a replica.
    """

    data_parallel: int = 1
    tile_parallel: int = 1
    data_axis: str = "data"
    tile_axis: str = "tile"


@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    opt: OptConfig = field(default_factory=OptConfig)
    raster: RasterConfig = field(default_factory=RasterConfig)
    data: DataConfig = field(default_factory=DataConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    model_path: str = "output/run"
    seed: int = 1234
    test_iterations: Tuple[int, ...] = (2000, 3000, 4000, 5000, 6000, 7000)
    save_iterations: Tuple[int, ...] = (4000, 10000)
    checkpoint_iterations: Tuple[int, ...] = ()
    log_every: int = 10


def replace(cfg, **kw):
    """Functional update helper for frozen config dataclasses."""
    return dataclasses.replace(cfg, **kw)
