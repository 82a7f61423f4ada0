"""Rays/s scaling harness (BASELINE north star: >=80% scaling efficiency).

Measures data-parallel training throughput (frames/s -> rays/s) at mesh
sizes 1..N on whatever devices are available — real TPU chips on a pod
slice, or the virtual CPU mesh in tests (where it validates the harness,
not the hardware). The reference has no distributed mode at all
(SURVEY.md §2.3), so these numbers have no upstream counterpart.
"""
from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, OptConfig, RasterConfig
from ..lidar.frames import LidarFrame, stack_frames
from ..models.field import AnchorField, init_field_from_points
from ..train.trainer import init_train_state
from .mesh import make_mesh
from .shard import make_dp_trainer


def synthetic_scene(mcfg: ModelConfig, H: int, W: int, n_points: int,
                    seed: int = 0, voxel_size: float = 0.5):
    rng = np.random.default_rng(seed)
    az = rng.uniform(-np.pi, np.pi, n_points)
    el = rng.uniform(np.radians(-18.0), np.radians(6.0), n_points)
    r = rng.uniform(4.0, 70.0, n_points)
    pts = np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
         r * np.sin(el)], -1
    )
    from ..lidar.beams import uniform_beam_inclinations

    beams = uniform_beam_inclinations(2.0, 22.0, H)
    gt = np.zeros((3, H, W), np.float32)
    gt[0] = (rng.uniform(size=(H, W)) > 0.2).astype(np.float32)
    gt[1] = rng.uniform(size=(H, W)).astype(np.float32) * gt[0]
    gt[2] = rng.uniform(5.0, 65.0, size=(H, W)).astype(np.float32) * gt[0]
    field = init_field_from_points(jax.random.key(seed), mcfg, pts,
                                   voxel_size=voxel_size)
    frame = LidarFrame.from_lidar2world(np.eye(4), beams, gt, uid=0)
    return field, frame


def measure_dp_rate(
    mesh,
    mcfg: ModelConfig,
    rcfg: RasterConfig,
    ocfg: OptConfig,
    H: int = 64,
    W: int = 2650,
    n_points: int = 60_000,
    steps: int = 10,
    warmup: int = 2,
    voxel_size: float = 0.5,
    runtime=None,
) -> dict:
    """Train-step throughput on ONE mesh (any size, any number of hosts).

    Under a multi-process runtime the mesh spans hosts: every process
    calls this SPMD with identical args, builds only its local frame
    slice, and the timed loop includes the cross-host gradient psum.
    Returns {devices, hosts, ms_per_step, frames_per_s, rays_per_s}.
    """
    field, frame = synthetic_scene(mcfg, H, W, n_points, voxel_size=voxel_size)
    bg = jnp.zeros((mcfg.color_channel,), jnp.float32)
    step = make_dp_trainer(mesh, mcfg, rcfg, ocfg, bg=bg)
    d = mesh.devices.size
    if runtime is not None and runtime.num_processes > 1:
        state = runtime.replicate_tree(
            init_train_state(jax.tree.map(jnp.copy, field), mcfg), mesh)
        n_local = d // runtime.num_processes
        frames = runtime.shard_batch(stack_frames([frame] * n_local), mesh)
        hosts = runtime.num_processes
    else:
        state = init_train_state(jax.tree.map(jnp.copy, field), mcfg)
        frames = stack_frames([frame] * d)
        hosts = 1
    for _ in range(warmup):
        state, m = step(state, frames)
    jax.block_until_ready(state.params["anchor"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, frames)
    jax.block_until_ready(state.params["anchor"])
    dt = (time.perf_counter() - t0) / steps
    fps = d / dt
    return {
        "devices": d,
        "hosts": hosts,
        "ms_per_step": dt * 1e3,
        "frames_per_s": fps,
        "rays_per_s": fps * H * W,
    }


def measure_dp_scaling(
    mcfg: ModelConfig,
    rcfg: RasterConfig,
    ocfg: OptConfig,
    H: int = 64,
    W: int = 2650,
    n_points: int = 60_000,
    device_counts: Optional[List[int]] = None,
    steps: int = 10,
    warmup: int = 2,
    voxel_size: float = 0.5,
) -> List[dict]:
    """Train-step throughput at each device count. Returns one record per
    mesh size: {devices, ms_per_step, frames_per_s, rays_per_s, efficiency}
    (efficiency vs linear scaling of the 1-device rate)."""
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    base_rate = None
    out = []
    for d in device_counts:
        mesh = make_mesh(data=d, tile=1)
        rec = measure_dp_rate(mesh, mcfg, rcfg, ocfg, H=H, W=W,
                              n_points=n_points, steps=steps, warmup=warmup,
                              voxel_size=voxel_size)
        if base_rate is None:
            base_rate = rec["rays_per_s"]
        rec["efficiency"] = rec["rays_per_s"] / (base_rate * d / device_counts[0])
        out.append(rec)
    return out
