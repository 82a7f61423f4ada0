"""Multi-host distributed runtime: process coordination + global arrays.

Net-new layer (the reference is strictly one process / one GPU,
SURVEY.md §2.3). TPU-first design per SURVEY.md §5 "Distributed
communication backend":

  * `jax.distributed.initialize` couples N processes (hosts) into one
    SPMD program; every process sees the same global device list and
    runs the same jitted computations in the same order.
  * one global `Mesh` over (data, tile): the data axis spans hosts, so
    gradient psums ride DCN across hosts and ICI within a slice; tile
    sharding stays host-local.
  * frames are loaded per host: each process materialises only its own
    slice of the global frame batch and assembles the global array with
    `jax.make_array_from_process_local_data` (no host ever holds the
    full batch).
  * parameters/optimizer state are fully replicated; `replicate_tree`
    builds the global replicated arrays from identical host-local
    values (all hosts seed identically, so values agree by
    construction — asserted cheaply via a psum fingerprint).

On a localhost fleet (tests, CI) the same code runs over N processes of
virtual CPU devices coordinated through gloo — process-boundary
semantics (non-addressable shards, per-host data, cross-host psum) are
exactly those of a real multi-host TPU pod, minus the ICI fabric.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..config import ParallelConfig


@dataclass(frozen=True)
class RuntimeConfig:
    """How this process joins the fleet.

    Single process (the default) skips `jax.distributed.initialize`
    entirely. `platform`/`local_device_count` exist for localhost
    fleets where the backend must be pinned to CPU *before* first use
    (the axon sitecustomize force-registers the TPU plugin, so only
    `jax.config.update` works — see tests/conftest.py).
    """

    coordinator_address: Optional[str] = None   # "host:port" of process 0
    num_processes: int = 1
    process_id: int = 0
    platform: Optional[str] = None              # e.g. "cpu" for local fleets
    local_device_count: Optional[int] = None    # virtual CPU devices / process


class Runtime:
    """Handle on the initialized fleet. All methods are process-safe:
    every process calls them with identical arguments (SPMD)."""

    def __init__(self, cfg: RuntimeConfig):
        self.cfg = cfg
        self.num_processes = cfg.num_processes
        self.process_id = cfg.process_id

    # -- identity ---------------------------------------------------------
    @property
    def is_coordinator(self) -> bool:
        return self.process_id == 0

    # -- mesh -------------------------------------------------------------
    def global_mesh(self, data: int = -1, tile: int = 1,
                    pcfg: ParallelConfig = ParallelConfig()):
        """Mesh over ALL global devices. data=-1: use every device.

        Device order follows `jax.devices()` (process-major), so the
        data axis strides across hosts first -> frame batches shard one
        contiguous block per host and the gradient all-reduce is the
        only cross-host collective.
        """
        import jax
        from jax.sharding import Mesh

        devices = jax.devices()
        if data == -1:
            data = len(devices) // tile
        need = data * tile
        if need > len(devices):
            raise ValueError(
                f"mesh {data}x{tile} needs {need} devices, have {len(devices)}"
            )
        arr = np.asarray(devices[:need]).reshape(data, tile)
        return Mesh(arr, (pcfg.data_axis, pcfg.tile_axis))

    # -- global arrays ----------------------------------------------------
    def replicate_tree(self, tree, mesh):
        """Host-local pytree -> fully-replicated global arrays.

        Every process must pass the same values (identical seeding);
        this only assembles the addressable shards, it does not
        broadcast."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P())
        local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]

        def leaf(x):
            x = np.asarray(x)
            bufs = [jax.device_put(x, d) for d in local]
            return jax.make_array_from_single_device_arrays(x.shape, sh, bufs)

        return jax.tree.map(leaf, tree)

    def shard_batch(self, local_tree, mesh,
                    pcfg: ParallelConfig = ParallelConfig()):
        """Host-local batch pytree (leading dim = local batch) -> global
        array sharded over the data axis (global batch = sum of local)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        def leaf(x):
            x = np.asarray(x)
            sh = NamedSharding(
                mesh, P(*([pcfg.data_axis] + [None] * (x.ndim - 1)))
            )
            return jax.make_array_from_process_local_data(sh, x)

        return jax.tree.map(leaf, local_tree)

    # -- per-host data schedule --------------------------------------------
    def local_indices(self, indices: Sequence[int]) -> List[int]:
        """This host's slice of a global per-step index list. The list is
        computed identically on every host (shared seed); slicing keeps
        frame loading host-local."""
        n = len(indices)
        if n % self.num_processes != 0:
            raise ValueError(
                f"global batch {n} not divisible by {self.num_processes} hosts"
            )
        per = n // self.num_processes
        lo = self.process_id * per
        return list(indices[lo:lo + per])

    # -- synchronization ----------------------------------------------------
    def sync(self, name: str = "barrier"):
        import jax

        if self.num_processes > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    def fingerprint(self, tree, mesh) -> float:
        """Cheap cross-host agreement check: psum of a hash-ish reduction
        over the replicated tree. Equal contributions -> value is
        n_devices * local value; disagreement shows up as a mismatch
        between processes' printed values (and usually as divergence
        later). Returns the local float."""
        import jax
        import jax.numpy as jnp

        def red(acc, x):
            return acc + jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)))

        total = jax.tree.reduce(red, tree, jnp.zeros((), jnp.float32))
        return float(total)


def init_runtime(cfg: RuntimeConfig) -> Runtime:
    """Pin the platform, bring up `jax.distributed`, return the handle.

    MUST run before any other JAX backend use in the process (platform
    and device-count config are locked at first backend query)."""
    import jax

    # idempotent: --warmup re-enters the CLI main() in-process, and config
    # updates raise once the backend is live — tolerate both
    try:
        if cfg.platform is not None:
            jax.config.update("jax_platforms", cfg.platform)
        if cfg.local_device_count is not None:
            jax.config.update("jax_num_cpu_devices", cfg.local_device_count)
    except RuntimeError:
        pass
    if cfg.num_processes > 1:
        if not cfg.coordinator_address:
            raise ValueError("multi-process runtime needs coordinator_address")
        try:
            jax.distributed.initialize(
                coordinator_address=cfg.coordinator_address,
                num_processes=cfg.num_processes,
                process_id=cfg.process_id,
            )
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
        assert jax.process_count() == cfg.num_processes
    return Runtime(cfg)


def frame_schedule(seed: int, step: int, global_batch: int, n_frames: int,
                   ) -> List[int]:
    """Deterministic per-step frame indices, identical on every host.

    Epoch-shuffled without replacement like the reference's
    viewpoint_stack.pop(randint) loop (train.py:136-138), generalized to
    B frames per step: a seeded permutation of the frame list is consumed
    B at a time and reshuffled when exhausted."""
    start = step * global_batch
    # Each epoch's permutation is independently seeded by (seed, epoch), so
    # any window is O(global_batch) to produce — no replaying the history
    # from step 0 (that made the per-step host cost O(step); ADVICE r2).
    first_epoch = start // n_frames
    last_epoch = (start + global_batch - 1) // n_frames
    perm: List[int] = []
    for epoch in range(first_epoch, last_epoch + 1):
        rng = np.random.default_rng((seed, epoch))
        perm.extend(rng.permutation(n_frames).tolist())
    lo = start - first_epoch * n_frames
    return perm[lo:lo + global_batch]
