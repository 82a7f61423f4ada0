"""Multi-process DP training worker (one process of a localhost fleet).

Spawned by tests/test_multiprocess.py with a JSON config argv. Runs K
data-parallel train steps (+ one densify) over the global mesh formed by
all processes' CPU devices, then the coordinator dumps final state to
npz. The same worker with num_processes=1 is the single-process control:
identical global batch, identical schedule — params must agree.

This is product-path code end to end: parallel.runtime for process
coordination and global-array assembly, parallel.shard.make_dp_trainer
for the step, models.densify for growth — nothing test-only except the
synthetic frames.
"""
import json
import sys

import numpy as np


def make_frames(H, W, n_frames, beams):
    """Deterministic tiny frames: every process builds the identical list;
    only its local slice is ever stacked into the global batch."""
    from lidargs_tpu.lidar.frames import LidarFrame

    frames = []
    rng = np.random.default_rng(42)
    for f in range(n_frames):
        gt = np.zeros((3, H, W), np.float32)
        gt[0] = (rng.uniform(size=(H, W)) > 0.2).astype(np.float32)
        gt[1] = rng.uniform(size=(H, W)).astype(np.float32) * gt[0]
        gt[2] = rng.uniform(5.0, 70.0, size=(H, W)).astype(np.float32) * gt[0]
        l2w = np.eye(4)
        l2w[:3, 3] = [0.3 * f, -0.1 * f, 0.02 * f]
        frames.append(LidarFrame.from_lidar2world(l2w, beams, gt, uid=f))
    return frames


def main():
    cfg = json.loads(sys.argv[1])

    from lidargs_tpu.parallel.runtime import (
        RuntimeConfig, frame_schedule, init_runtime,
    )

    rt = init_runtime(RuntimeConfig(
        coordinator_address=cfg["coord"],
        num_processes=cfg["nproc"],
        process_id=cfg["pid"],
        platform="cpu",
        local_device_count=cfg["local_devices"],
    ))

    import jax
    import jax.numpy as jnp

    from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations
    from lidargs_tpu.lidar.frames import stack_frames
    from lidargs_tpu.models.densify import densify_step
    from lidargs_tpu.models.field import init_field_from_points
    from lidargs_tpu.parallel.shard import make_dp_trainer
    from lidargs_tpu.train.trainer import init_train_state

    print(f"[p{rt.process_id}] local={jax.local_device_count()} "
          f"global={jax.device_count()}", flush=True)

    mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8,
                       anchor_capacity=512, grow_src_cap=256,
                       grow_cap_per_level=64)
    rcfg = RasterConfig(max_visible=512, max_tiles_per_gaussian=8,
                        tile_capacity=32, chunk=8)
    ocfg = OptConfig(start_stat=0, update_from=0, update_interval=2,
                     densify_grad_threshold=1e-7)

    H, W, F = 8, 256, 8
    rng = np.random.default_rng(0)
    az = rng.uniform(-np.pi, np.pi, 1500)
    el = rng.uniform(np.radians(-18.0), np.radians(8.0), 1500)
    r = rng.uniform(5.0, 60.0, 1500)
    pts = np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
         r * np.sin(el)], -1,
    )
    beams = uniform_beam_inclinations(10.0, 30.0, H)
    frames = make_frames(H, W, F, beams)
    field = init_field_from_points(jax.random.key(0), mcfg, pts, voxel_size=8.0)

    variant = cfg.get("variant", "beam")
    mesh = rt.global_mesh(data=-1)
    step_fn = make_dp_trainer(mesh, mcfg, rcfg, ocfg,
                              bg=jnp.zeros((2,), jnp.float32),
                              variant=variant)
    state = rt.replicate_tree(init_train_state(field, mcfg), mesh)

    B = cfg["batch"]
    for t in range(cfg["steps"]):
        idx = frame_schedule(123, t, B, F)
        loc = rt.local_indices(idx)
        fb = stack_frames([frames[i] for i in loc])
        gfb = rt.shard_batch(fb, mesh)
        state, metrics = step_fn(state, gfb)
        if (t + 1) == cfg.get("densify_at", -1):
            state, dstats = densify_step(
                state, jax.random.key(7), mcfg, ocfg, 8.0, check_interval=2
            )
            print(f"[p{rt.process_id}] densify +{int(dstats.n_grown)} "
                  f"-{int(dstats.n_pruned)}", flush=True)
        print(f"[p{rt.process_id}] step {t}: "
              f"loss={float(metrics.loss.total):.6f}", flush=True)

    rt.sync("end-of-training")
    # coordinator-gated eval/save, the CLI's pattern (train/cli.py): only
    # the coordinator computes, on a HOST-LOCAL copy of the replicated
    # state (a fresh jit over the global arrays from one process would
    # hang waiting for the other hosts), then everyone re-syncs
    eval_arrays = {}
    if rt.is_coordinator:
        from lidargs_tpu.train.trainer import Trainer

        hs_params = jax.tree.map(np.asarray, state.params)
        hs_valid = np.asarray(state.valid)
        tr = Trainer(mcfg=mcfg, ocfg=ocfg, rcfg=rcfg,
                     bg=jnp.zeros((2,), jnp.float32), variant=variant)
        out = tr.render(
            jax.tree.map(jnp.asarray, hs_params), jnp.asarray(hs_valid),
            frames[0],
        )
        eval_arrays = {
            "eval_occ": np.asarray(out.occ),
            "eval_depth": np.asarray(out.depth),
        }
    rt.sync("post-eval")
    if rt.is_coordinator:
        np.savez(
            cfg["out"],
            anchor=np.asarray(state.params["anchor"]),
            offset=np.asarray(state.params["offset"]),
            feat=np.asarray(state.params["feat"]),
            scaling=np.asarray(state.params["scaling"]),
            valid=np.asarray(state.valid),
            opacity_accum=np.asarray(state.opacity_accum),
            offset_grad_accum=np.asarray(state.offset_grad_accum),
            step=np.asarray(state.step),
            **eval_arrays,
        )
    print(f"[p{rt.process_id}] OK", flush=True)


if __name__ == "__main__":
    main()
