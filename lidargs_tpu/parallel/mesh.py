"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.3) — this layer is
net-new. Design: a 2-axis mesh ('data', 'tile'); frames are data-parallel
over 'data' (the natural outer loop is one random frame per step,
train.py:136-138), and the range image's tile lists shard over 'tile'
(azimuth tiles are independent after binning). Parameters stay replicated;
XLA inserts the gradient all-reduce (psum over 'data') and overlaps it with
the backward pass on ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ParallelConfig


def make_mesh(
    data: int = 1,
    tile: int = 1,
    devices: Optional[Sequence] = None,
    cfg: ParallelConfig = ParallelConfig(),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * tile
    if need > len(devices):
        raise ValueError(f"mesh {data}x{tile} needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, tile)
    return Mesh(arr, (cfg.data_axis, cfg.tile_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def frame_sharded(mesh: Mesh, cfg: ParallelConfig = ParallelConfig()) -> NamedSharding:
    """Leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(cfg.data_axis))


def tile_sharding(mesh: Mesh, cfg: ParallelConfig = ParallelConfig()) -> NamedSharding:
    """Leading (tile-list) axis over the tile axis."""
    return NamedSharding(mesh, P(cfg.tile_axis))
