"""Training CLI — the reference's train.py driver re-imagined.

python -m lidargs_tpu.train.cli -s <data> --data_label waymo -m <out> \
    --iterations 10000

Differences from the reference loop (train.py:86-260), by design:
  * one jitted step; the host never syncs except at log/eval boundaries
    (a device sync per step costs ~2.4 s through remote-TPU tunnels);
  * densify/prune is a jitted capacity-masked transform, not tensor
    reallocation;
  * checkpoints are npz pytrees (the reference's mid-run restore is broken
    as released, gaussian_model.py:169-197).
"""
from __future__ import annotations

import argparse
import json
import logging
import math
import os
import random
import sys
import time

import numpy as np


def get_logger(model_path: str, suffix: str = "") -> logging.Logger:
    logger = logging.getLogger("lidargs_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    os.makedirs(model_path, exist_ok=True)
    fh = logging.FileHandler(os.path.join(model_path, f"outputs{suffix}.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


def build_config(argv=None):
    from ..config import (
        DataConfig, ModelConfig, OptConfig, RasterConfig, TrainConfig, replace,
    )

    p = argparse.ArgumentParser("lidargs_tpu trainer")
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", default="output/run")
    p.add_argument("--data_label", default="waymo")
    p.add_argument("--iterations", type=int, default=10_000)
    p.add_argument("--num_frames", type=int, default=50)
    p.add_argument("--voxel_size", type=float, default=0.0)
    p.add_argument("--anchor_capacity", type=int, default=2**17)
    p.add_argument("--max_visible", type=int, default=2**18)
    p.add_argument("--tile_capacity", type=int, default=None,
                   help="depth-sorted instances composited per tile "
                        "(default: 768 beam / 384 surfel)")
    p.add_argument("--tile_h", type=int, default=None,
                   help="pixel rows per tile (1/2/4/8; default config). "
                        "Wider tiles collapse duplicate instance emission "
                        "(r4 on-chip: h4/K768/cap8 12.4 ms vs h1 16.4 ms "
                        "at 3x lower truncation error)")
    p.add_argument("--max_tiles_per_gaussian", type=int, default=None,
                   help="per-gaussian touched-tile cap (binning sort is "
                        "V*cap keys; wider tiles need smaller caps)")
    p.add_argument("--pallas_chunk", type=int, default=None,
                   help="instances per compositing kernel loop step")
    p.add_argument("--instance_capacity", type=int, default=None,
                   help="rank-search instance emission budget (0 = exact "
                        "dense, -1 = legacy expansion; default config)")
    p.add_argument("--remat_projection", type=int, default=None,
                   choices=(0, 1),
                   help="recompute the per-gaussian projection in the "
                        "backward instead of storing residuals (default "
                        "OFF since r5: the hand-derived projection VJP "
                        "subsumes the residual saving and measured better "
                        "— 26.6 vs 28.3 ms/step at h4/K768/cap8; setting "
                        "this disables the hand VJP)")
    p.add_argument("--fused_gather", action="store_true",
                   help="fused-gather windowed-DMA pallas kernels (no "
                        "[T,K,F] materialization; beam variant)")
    p.add_argument("--raydrop_lambda", type=float, default=None)
    p.add_argument("--raydrop_refiner", default=None,
                   help="apply a trained raydrop-refiner npz (cli refine) "
                        "to the rendered raydrop channel during eval — the "
                        "reference's post-refinement inference path "
                        "(scene/extre_train_raydrop.py:119-209)")
    p.add_argument("--lpips_weights", default=None,
                   help="npz from tools/convert_lpips_weights.py — enables "
                        "the VGG-LPIPS eval metric (train.py:519-529); "
                        "skipped when absent")
    p.add_argument("--surfel", action="store_true",
                   help="train/render through the 2DGS surfel rasterizer "
                        "with distortion + normal-consistency regularizers "
                        "(the reference ships the surfel kernels but no "
                        "training glue, readme.md:42)")
    p.add_argument("--depth_min", type=float, default=None,
                   help="depth-metric lower clamp (default: 5 for waymo, "
                        "1 otherwise, arguments/__init__.py:158)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="train data-parallel over N devices (frames sharded "
                        "on the mesh 'data' axis, grad all-reduce inserted "
                        "by XLA). 0/1 = single-device. Net-new vs the "
                        "reference's one-GPU loop (SURVEY.md §2.3)")
    p.add_argument("--dp_batch", type=int, default=0,
                   help="global frames per DP step (default: data_parallel; "
                        "must be divisible by it)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 — enables multi-host "
                        "training via jax.distributed (parallel/runtime.py)")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--mp_platform", default=None,
                   help="pin the JAX platform before distributed init "
                        "(e.g. cpu for localhost fleets)")
    p.add_argument("--mp_local_devices", type=int, default=None,
                   help="virtual device count per process (CPU fleets)")
    p.add_argument("--update_from", type=int, default=None,
                   help="densify schedule start (OptConfig default 500)")
    p.add_argument("--update_until", type=int, default=None,
                   help="densify schedule end (OptConfig default 7000)")
    p.add_argument("--update_interval", type=int, default=None,
                   help="densify cadence (OptConfig default 100)")
    p.add_argument("--start_stat", type=int, default=None,
                   help="densification-statistics start iteration")
    p.add_argument("--test_iterations", type=int, nargs="*", default=None)
    p.add_argument("--save_iterations", type=int, nargs="*", default=None)
    p.add_argument("--checkpoint_iterations", type=int, nargs="*", default=[])
    p.add_argument("--start_checkpoint", type=int, default=None)
    p.add_argument("--eval_chamfer", action="store_true")
    p.add_argument("--dump_renders", action="store_true",
                   help="save per-frame renders as npy (raydrop refiner input)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--config", default=None,
                   help="load argument defaults from a saved cfg_args.json "
                        "(the reference's get_combined_args, minus its "
                        "eval() of config files, arguments/__init__.py:163-183)")
    p.add_argument("--init_ply", default=None,
                   help="initialize anchors from this PLY instead of the "
                        "fused frames (used by --warmup phase 2)")
    p.add_argument("--warmup", action="store_true",
                   help="two-phase restart: train, then re-train from the "
                        "saved PLY (train.py:635-638)")
    p.add_argument("--load_iteration", type=int, default=None,
                   help="eval-only: load a saved snapshot, run the metric "
                        "sweep + FPS (render_sets/evaluate equivalent, "
                        "train.py:394-551), save test renders as PNGs")
    p.add_argument("--tensorboard", action="store_true",
                   help="log scalars/images to <model_path>/tb")
    p.add_argument("--wandb", default=None, metavar="PROJECT",
                   help="log train/eval scalars to Weights & Biases "
                        "(train.py:53-60,611-622); silently no-op when the "
                        "package is unavailable")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of N steps into "
                        "<model_path>/trace")
    args, _ = p.parse_known_args(argv)
    if args.config:
        with open(args.config) as f:
            saved = json.load(f)
        p.set_defaults(**{k: v for k, v in saved.items()
                          if k in {a.dest for a in p._actions}})
    args = p.parse_args(argv)

    # kitti default raydrop weight is 1 (train.py:164)
    rd_lambda = args.raydrop_lambda
    if rd_lambda is None:
        rd_lambda = 10.0 if args.data_label == "waymo" else 1.0
    depth_min = args.depth_min
    if depth_min is None:
        depth_min = 5.0 if args.data_label == "waymo" else 1.0
    eff_cap = (args.tile_capacity if args.tile_capacity is not None
               else (384 if args.surfel else 768))
    eff_tile_h = (args.tile_h if args.tile_h is not None
                  else (1 if args.surfel else 4))
    # r5: default OFF — the hand-derived projection VJP
    # (RasterConfig.projection_hand_vjp, on by default) subsumes remat's
    # residual saving and measured better head-to-head at the training
    # default (26.6 vs 28.3 ms/step, bench_train_step h4/K768/cap8);
    # remat disables the hand VJP, so enabling it is now a pessimization
    # unless the hand VJP is also turned off.
    remat_proj = (bool(args.remat_projection)
                  if args.remat_projection is not None else False)

    cfg = TrainConfig(
        model=ModelConfig(voxel_size=args.voxel_size,
                          anchor_capacity=args.anchor_capacity),
        opt=replace(OptConfig(), iterations=args.iterations,
                    raydrop_lambda=rd_lambda, depth_min=depth_min,
                    **{k: v for k, v in (
                        ("update_from", args.update_from),
                        ("update_until", args.update_until),
                        ("update_interval", args.update_interval),
                        ("start_stat", args.start_stat),
                    ) if v is not None}),
        raster=replace(
            RasterConfig(), max_visible=args.max_visible,
            **{k: v for k, v in (
                # Beam training default = h4/K768/cap8, the winner of the
                # r4 on-chip 500-iter street training A/B
                # (tools/bench_train_ab.py, /tmp committed to DESIGN §12):
                # loss 4.22 vs base 4.91, PSNR 17.70 vs 17.37, raydrop acc
                # 0.983 vs 0.960, depth MAE 4.01 vs 4.70, at 109 vs 209
                # ms/step — wider tiles collapse duplicate instance
                # emission so the same K budget truncates 3x less.
                # bench.py's render-FPS autotune may pick the faster
                # h4/K512/cap4 (10.33 ms fwd) for the eval headline; both
                # pass its quality gate — the TRAINING default prefers the
                # config that measured better end-of-training quality at
                # equal training speed. The surfel kernel keeps the 1x128
                # layout (its pallas path requires tile_h=1).
                ("tile_h", eff_tile_h),
                ("tile_capacity", eff_cap),
                ("max_tiles_per_gaussian", args.max_tiles_per_gaussian
                 if args.max_tiles_per_gaussian is not None
                 else (None if args.surfel else 8)),
                ("pallas_chunk", args.pallas_chunk),
                ("instance_capacity", args.instance_capacity),
                # Rematerialize the projection in the backward at the
                # beam training default: measured on chip (r4,
                # bench_train_step) 30.1 -> 28.9 ms/step at h4/K768/cap8.
                # It LOSES at smaller K (h4/K512/cap4 22.4 -> 23.2 ms:
                # recompute overhead beats the residual-traffic saving
                # only once the stored-intermediate volume is large), so
                # the default is gated on tile_capacity >= 768.
                ("remat_projection", remat_proj),
            ) if v is not None},
            **({"fused_gather": True, "backend": "pallas"}
               if args.fused_gather else {}),
        ),
        data=DataConfig(source_path=args.source_path,
                        data_label=args.data_label,
                        num_frames=args.num_frames),
        model_path=args.model_path,
        seed=args.seed,
        test_iterations=tuple(args.test_iterations
                              if args.test_iterations is not None
                              else range(2000, args.iterations + 1, 1000)),
        save_iterations=tuple(args.save_iterations
                              if args.save_iterations is not None
                              else (args.iterations,)),
        checkpoint_iterations=tuple(args.checkpoint_iterations),
        log_every=args.log_every,
    )
    return cfg, args


def run_eval(scene, state, trainer, cfg, logger, compute_chamfer=False,
             refiner_path=None, tb=None, step=0, lpips_weights=None):
    import jax
    import jax.numpy as jnp

    from .metrics import evaluate_frame, mean_metrics

    render = jax.jit(
        lambda p, v, f: trainer.render(p, v, f)
    )
    lpips_fn = None
    if lpips_weights:
        # VGG-LPIPS on the intensity render vs GT (train.py:519-529); skipped
        # cleanly when no weights file is provided (zero-egress environment)
        from .lpips import load_lpips_params, lpips_single

        lp = load_lpips_params(lpips_weights)
        lpips_fn = jax.jit(lambda a, b: lpips_single(lp, a, b))
    refine = None
    if refiner_path:
        from ..utils.serialization import load_pytree_npz

        depth_scale = trainer.ocfg.depth_max
        # arch sniff: UNet pytrees carry the "inc" conv (cli refine --arch)
        is_unet = any(k.startswith("inc") for k in np.load(refiner_path).files)
        if is_unet:
            from ..models.raydrop import init_unet, refine_raydrop_unet

            rp = load_pytree_npz(refiner_path, init_unet(jax.random.key(0)))

            @jax.jit
            def refine(color, depth):
                rd = refine_raydrop_unet(rp, color[1], color[0],
                                         depth / depth_scale)
                return jnp.stack([color[0], rd], 0)
        else:
            from ..models.raydrop import init_raydrop_mlp, refine_raydrop
            from ..ops.composite import pixel_rays

            rp = load_pytree_npz(refiner_path, init_raydrop_mlp(jax.random.key(0)))
            fr0 = scene.data.train_frames[0]
            H, W = fr0.H, fr0.W
            rows = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
            cols = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
            dirs_hw3 = pixel_rays(rows, cols, jnp.asarray(fr0.beams), W).reshape(H, W, 3)

            @jax.jit
            def refine(color, depth):
                rd = refine_raydrop(rp, dirs_hw3, color[0], depth / depth_scale)
                return jnp.stack([color[0], rd], 0)

    results = {}
    for name, frames in (("test", scene.data.test_frames),
                         ("train", scene.data.train_frames)):
        if not frames:
            # tiny fixtures / eval_split-off scenes can have an empty split
            logger.info(f"[eval {name}] no frames — skipped")
            continue
        per = []
        for idx, fr in enumerate(frames):
            out = render(state.params, state.valid, fr)
            color = out.color
            if refine is not None:
                color = refine(color, out.depth)
            if tb is not None and tb.active and name == "test" and idx < 4:
                # turbo depth + intensity render + GT (train.py:327-338)
                tb.depth_image(f"eval/{name}_{idx}/depth",
                               np.asarray(out.depth), step,
                               vmax=trainer.ocfg.depth_max)
                gray = lambda x: np.repeat(np.asarray(x)[..., None], 3, -1)
                tb.image(f"eval/{name}_{idx}/render",
                         gray(jnp.clip(color[0], 0, 1)), step)
                tb.image(f"eval/{name}_{idx}/gt",
                         gray(fr.gt_image[1] * fr.gt_image[0]), step)
            pv = evaluate_frame(
                color, out.depth, fr.gt_image, fr.beams,
                depth_min=trainer.ocfg.depth_min,
                depth_max=trainer.ocfg.depth_max,
                compute_chamfer=compute_chamfer,
            )
            if lpips_fn is not None:
                pv["intensity_lpips"] = float(lpips_fn(
                    jnp.clip(color[0], 0.0, 1.0),
                    fr.gt_image[1] * fr.gt_image[0],
                ))
            # per_view_count.json parity (train.py:435, metrics VISIBLE_COUNT)
            pv["visible_count"] = float(jnp.sum(out.visible))
            per.append(pv)
        m = mean_metrics(per)
        results[name] = m
        results[f"per_view_{name}"] = {
            f"{i:05d}": pv for i, pv in enumerate(per)
        }
        logger.info(
            f"[eval {name}] psnr={m['intensity_psnr']:.3f} "
            f"ssim={m['intensity_ssim']:.4f} "
            f"rd_acc={m['raydrop_acc']:.4f} "
            f"d_rmse={m['depth_rmse']:.4f} d_medae={m['depth_medae']:.4f}"
            + (f" cd={m.get('depth_cd', 0):.5f} f={m.get('depth_fscore', 0):.4f}"
               if compute_chamfer else "")
        )
    # results.json / per_view.json persistence (train.py:435-436,548-551)
    mean_out = {k: v for k, v in results.items() if not k.startswith("per_view_")}
    with open(os.path.join(cfg.model_path, "results.json"), "w") as f:
        json.dump(mean_out, f, indent=2)
    with open(os.path.join(cfg.model_path, "per_view.json"), "w") as f:
        json.dump({k: v for k, v in results.items()
                   if k.startswith("per_view_")}, f, indent=2)
    return results


def measure_fps(scene, state, trainer, logger, warmup: int = 5):
    """render_set-equivalent FPS (train.py:408-462): per-frame wall clock
    with device sync, mean of 1/t excluding warmup frames."""
    import jax


    render = jax.jit(
        lambda p, v, f: trainer.render(p, v, f)
    )
    frames = scene.data.train_frames + scene.data.test_frames
    ts = []
    for i, fr in enumerate(frames):
        t0 = time.perf_counter()
        out = render(state.params, state.valid, fr)
        jax.block_until_ready(out.color)
        ts.append(time.perf_counter() - t0)
    fps = float(np.mean([1.0 / t for t in ts[warmup:]]))
    logger.info(f"[fps] {fps:.2f} frames/s over {len(ts) - warmup} frames")
    return fps


def main(argv=None):
    cfg, args = build_config(argv)

    # multi-host: couple the process fleet BEFORE any JAX backend use
    # (jax.distributed.initialize + platform pinning, parallel/runtime.py)
    rt = None
    if args.num_processes > 1 or args.mp_platform or args.mp_local_devices:
        from ..parallel.runtime import RuntimeConfig, init_runtime

        rt = init_runtime(RuntimeConfig(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            platform=args.mp_platform,
            local_device_count=args.mp_local_devices,
        ))
    is_coord = rt.is_coordinator if rt is not None else True

    logger = get_logger(cfg.model_path,
                        suffix="" if is_coord else f".p{args.process_id}")
    if is_coord:
        with open(os.path.join(cfg.model_path, "cfg_args.json"), "w") as f:
            json.dump(vars(args), f, indent=2, default=str)

    import jax
    import jax.numpy as jnp

    from ..data.scene import Scene
    from ..models.field import AnchorField
    from .trainer import Trainer, init_train_state

    scene = Scene.create(cfg, load_iteration=args.load_iteration,
                         init_ply=args.init_ply)
    logger.info(
        f"scene: {len(scene.data.train_frames)} train / "
        f"{len(scene.data.test_frames)} test frames, "
        f"{int(scene.field.valid.sum())} anchors, voxel {scene.field.voxel_size:.4f}"
    )

    bg = jnp.zeros((cfg.model.color_channel,), jnp.float32)
    variant = "surfel" if args.surfel else "beam"
    dp = args.data_parallel
    if rt is not None and dp == 0:
        dp = len(jax.devices())
    mesh = dp_batch = None
    if dp > 1 or rt is not None or (dp == 1 and args.dp_batch > 0):
        from ..parallel.mesh import make_mesh
        from ..parallel.shard import DPTrainer

        mesh = (rt.global_mesh(data=dp) if rt is not None
                else make_mesh(data=dp, tile=1))
        dp_batch = args.dp_batch or dp
        if dp_batch % dp or (rt is not None and dp_batch % rt.num_processes):
            raise ValueError(
                f"--dp_batch {dp_batch} must be divisible by the data-axis "
                f"size {dp}"
                + (f" and by {rt.num_processes} hosts" if rt is not None else "")
            )
        trainer = DPTrainer(variant=variant, mcfg=cfg.model, ocfg=cfg.opt,
                            rcfg=cfg.raster, bg=bg, mesh=mesh)
        logger.info(f"data-parallel: {dp}-device mesh"
                    + (f" across {rt.num_processes} hosts" if rt else "")
                    + f", {dp_batch} frames/step")
    else:
        trainer = Trainer(variant=variant, mcfg=cfg.model, ocfg=cfg.opt,
                          rcfg=cfg.raster, bg=bg)
    state = init_train_state(scene.field, cfg.model)
    if rt is not None:
        state = rt.replicate_tree(state, mesh)

    if args.load_iteration is not None:
        # eval-only: metric sweep + FPS + saved PNG renders. Under a
        # multi-host runtime only the coordinator writes (on a host-local
        # copy of the state, like the training-loop eval sites) — every
        # process racing on the same metrics/PNG files corrupts them
        # (ADVICE r2).
        if is_coord:
            hs = jax.tree.map(np.asarray, state) if rt is not None else state
            run_eval(scene, hs, trainer, cfg, logger,
                     compute_chamfer=args.eval_chamfer,
                     refiner_path=args.raydrop_refiner,
                     lpips_weights=args.lpips_weights)
            measure_fps(scene, hs, trainer, logger)
            render_sets(scene, hs, trainer, cfg, logger)
            if args.dump_renders:
                dump_renders(scene, hs, trainer, cfg, logger)
        if rt is not None:
            rt.sync("eval-only")
        return state
    first_iter = 0
    if args.start_checkpoint is not None:
        state = scene.load_train_state(args.start_checkpoint, like=state)
        if rt is not None:
            state = rt.replicate_tree(state, mesh)
        first_iter = args.start_checkpoint
        logger.info(f"resumed from iteration {first_iter}")

    from ..utils.profiling import (
        StepTimer, TensorBoardLogger, WandbLogger, trace as jtrace,
    )

    tb = TensorBoardLogger(os.path.join(cfg.model_path, "tb")
                           if args.tensorboard and is_coord else None)
    wb = WandbLogger(args.wandb if is_coord else None,
                     run_name=os.path.basename(cfg.model_path),
                     config=vars(args))
    timer = StepTimer().start()
    profile_ctx = None

    rng = random.Random(cfg.seed)
    frame_stack = None
    ema = None
    densify_key = jax.random.key(cfg.seed)
    t_start = time.time()
    best_test_psnr, best_test_it = float("-inf"), 0
    for it in range(first_iter + 1, cfg.opt.iterations + 1):
        if args.profile_steps and it == first_iter + 2:   # skip compile step
            profile_ctx = jtrace(os.path.join(cfg.model_path, "trace"))
            profile_ctx.__enter__()
        if mesh is not None:
            # DP: deterministic epoch-shuffled global batch, identical on
            # every host; each host stacks only its own slice
            from ..lidar.frames import stack_frames
            from ..parallel.runtime import frame_schedule

            idx = frame_schedule(cfg.seed, it - 1, dp_batch,
                                 len(scene.data.train_frames))
            loc = rt.local_indices(idx) if rt is not None else idx
            fb = stack_frames([scene.data.train_frames[i] for i in loc])
            if rt is not None:
                fb = rt.shard_batch(fb, mesh)
            state, metrics = trainer.step(state, fb, it)
        else:
            if not frame_stack:
                frame_stack = list(range(len(scene.data.train_frames)))
            fidx = frame_stack.pop(rng.randint(0, len(frame_stack) - 1))
            state, metrics = trainer.step(state, scene.data.train_frames[fidx], it)
        if profile_ctx is not None and it >= first_iter + 1 + args.profile_steps:
            jax.block_until_ready(state.params["anchor"])
            profile_ctx.__exit__(None, None, None)
            profile_ctx = None
            logger.info(f"profiler trace written to {cfg.model_path}/trace")

        if it % cfg.log_every == 0:
            loss = float(metrics.loss.total)  # sync point
            if not math.isfinite(loss) and is_coord:
                # dump-state-on-nonfinite (the reference's rasterizer input
                # snapshot mechanism, diff_lidargs_rasterization/__init__.py:
                # 84-96) — deterministic kernels make the dumped state an
                # exact offline repro; only materialized on failure
                from ..utils.debug import snapshot_if_nonfinite

                last_frame = (fb if mesh is not None
                              else scene.data.train_frames[fidx])
                snapshot_if_nonfinite(
                    loss, cfg.model_path, it,
                    jax.tree.map(np.asarray, state.params),
                    np.asarray(state.valid), last_frame, logger,
                )
            dt_ms = timer.tick()
            ema = loss if ema is None else 0.4 * loss + 0.6 * ema
            logger.info(
                f"iter {it}: loss={ema:.5f} anchors={int(metrics.n_anchors)} "
                f"visible={int(metrics.n_visible)} "
                f"overflow={int(metrics.n_overflow)} "
                f"({(time.time() - t_start) / it * 1e3:.0f} ms/it avg)"
            )
            if tb.active:
                lt = metrics.loss
                tb.scalars({
                    "total_loss": lt.total, "depth_l1": lt.depth,
                    "intensity": lt.intensity, "raydrop": lt.raydrop,
                    "l1_loss": lt.l1_intensity, "ssim": lt.ssim_intensity,
                }, it, prefix="train_loss/")
                tb.scalar("iter_time", dt_ms / cfg.log_every, it)
                tb.scalar("anchors", int(metrics.n_anchors), it)
            if wb.active:
                wb.log({"total_loss": float(metrics.loss.total),
                        "anchors": int(metrics.n_anchors)},
                       step=it, prefix="train/")
        if trainer.should_densify(int(metrics.n_anchors), it):
            densify_key, sub = jax.random.split(densify_key)
            state, dstats = trainer.densify(state, sub, scene.field.voxel_size)
            logger.info(
                f"iter {it}: densify +{int(dstats.n_grown)} "
                f"-{int(dstats.n_pruned)} anchors"
            )
        elif trainer.should_maintain(it):
            state = trainer.maintain(state)
        # under a multi-host runtime, eval/saves run coordinator-only on a
        # host-local copy (a fresh jit on the global arrays from a single
        # process would hang waiting for the other hosts)
        def _host(s):
            return jax.tree.map(np.asarray, s) if rt is not None else s

        if it in cfg.test_iterations:
            if is_coord:
                hs = _host(state)
                res = run_eval(scene, hs, trainer, cfg, logger,
                               compute_chamfer=args.eval_chamfer, tb=tb,
                               step=it, lpips_weights=args.lpips_weights)
                if wb.active:
                    wb.log(res["test"], step=it, prefix="test/")
                # best-test-checkpoint protocol: the reference reports a
                # test-iteration sweep and saves at fixed iters
                # (train.py:233-237,583); mid-train quality peaks (e.g. the
                # densify-era dip, PARITY r4) would otherwise be lost —
                # keep the best test-PSNR snapshot alongside the final one
                p = (res.get("test") or {}).get("intensity_psnr")
                if p is not None and p > best_test_psnr:
                    best_test_psnr, best_test_it = float(p), it
                    path = scene.save(hs.params, hs.valid, "best")
                    logger.info(f"new best test psnr {p:.3f} at iter {it} "
                                f"-> {path}")
            if rt is not None:
                rt.sync("eval")
        if it in cfg.save_iterations:
            if is_coord:
                hs = _host(state)
                path = scene.save(hs.params, hs.valid, it)
                logger.info(f"saved snapshot to {path}")
            if rt is not None:
                rt.sync("save")
        if it in cfg.checkpoint_iterations:
            if is_coord:
                path = scene.save_train_state(_host(state), it)
                logger.info(f"saved training checkpoint to {path}")
            if rt is not None:
                rt.sync("checkpoint")

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
    if rt is not None:
        state = jax.tree.map(np.asarray, state)
        rt.sync("end-of-training")
    if is_coord:
        res = run_eval(scene, state, trainer, cfg, logger,
                       compute_chamfer=args.eval_chamfer,
                       lpips_weights=args.lpips_weights)
        if wb.active:
            wb.log(res["test"], step=cfg.opt.iterations, prefix="test/")
        final_p = (res.get("test") or {}).get("intensity_psnr")
        if best_test_it and final_p is not None:
            logger.info(
                f"best test psnr {best_test_psnr:.3f} @ iter {best_test_it} "
                f"(saved at point_cloud/iteration_best) vs final "
                f"{final_p:.3f} @ {cfg.opt.iterations}"
            )
        measure_fps(scene, state, trainer, logger)
        if args.dump_renders:
            dump_renders(scene, state, trainer, cfg, logger)
    tb.close()
    wb.finish()
    if args.warmup:
        # two-phase restart (train.py:635-638): re-train with the saved PLY
        # as the init cloud instead of the raw back-projected frames
        logger.info("warmup finished — rebooting from the saved point cloud")
        argv2 = [a for a in (argv or sys.argv[1:]) if a != "--warmup"]
        ply = os.path.join(cfg.model_path, "point_cloud",
                           f"iteration_{cfg.opt.iterations}", "point_cloud.ply")
        argv2 += ["--init_ply", ply]
        return main(argv2)
    return state


def render_sets(scene, state, trainer, cfg, logger):
    """Save test-set renders as PNGs (render_set, train.py:394-468):
    intensity, raydrop mask, turbo depth per frame."""
    import jax

    from ..utils.visualize import depth_to_rgb, intensity_to_rgb, save_image

    render = jax.jit(
        lambda p, v, f: trainer.render(p, v, f)
    )
    out_dir = os.path.join(cfg.model_path, "test_renders")
    os.makedirs(out_dir, exist_ok=True)
    for i, fr in enumerate(scene.data.test_frames):
        out = render(state.params, state.valid, fr)
        inten = np.asarray(out.color[0])
        drop = (np.asarray(out.color[1]) > 0.5).astype(np.float32)
        save_image(os.path.join(out_dir, f"{i:03d}_intensity.png"),
                   intensity_to_rgb(inten * drop))
        save_image(os.path.join(out_dir, f"{i:03d}_depth.png"),
                   depth_to_rgb(np.asarray(out.depth) * drop))
        save_image(os.path.join(out_dir, f"{i:03d}_gt_intensity.png"),
                   intensity_to_rgb(np.asarray(fr.gt_image[1] * fr.gt_image[0])))
    logger.info(f"saved test renders to {out_dir}")


def dump_renders(scene, state, trainer, cfg, logger):
    """Per-frame [dir(3), intensity, depth, gt...] dumps — training input of
    the offline raydrop refiner (scene/extre_train_raydrop.py:68-117)."""
    import jax


    render = jax.jit(
        lambda p, v, f: trainer.render(p, v, f)
    )
    out_dir = os.path.join(cfg.model_path, "renders")
    os.makedirs(out_dir, exist_ok=True)
    # shared per-pixel ray dirs (dir.npy of extre_train_raydrop.py:70)
    fr0 = scene.data.train_frames[0]
    H, W = fr0.H, fr0.W
    import jax.numpy as jnp

    from ..ops.composite import pixel_rays

    rows = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
    cols = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
    np.save(os.path.join(out_dir, "dir.npy"),
            np.asarray(pixel_rays(rows, cols, jnp.asarray(fr0.beams), W)))
    for name, frames in (("train", scene.data.train_frames),
                         ("test", scene.data.test_frames)):
        for i, fr in enumerate(frames):
            out = render(state.params, state.valid, fr)
            np.save(
                os.path.join(out_dir, f"{name}_{i:03d}.npy"),
                np.stack(
                    [np.asarray(out.color[0]), np.asarray(out.color[1]),
                     np.asarray(out.depth), np.asarray(fr.gt_image[0]),
                     np.asarray(fr.gt_image[1]), np.asarray(fr.gt_image[2])],
                    axis=0,
                ).astype(np.float32),
            )
    logger.info(f"dumped renders to {out_dir}")


def refine_main(argv=None):
    """Standalone offline raydrop refinement over dumped renders — the
    TPU-native equivalent of `python scene/extre_train_raydrop.py`
    (tcnn frequency MLP -> models/raydrop.py). Usage:
    python -m lidargs_tpu.train.cli refine --renders <model_path>/renders"""
    import glob

    import jax

    from ..models.raydrop import train_raydrop_refiner, train_unet_refiner
    from ..utils.serialization import save_pytree_npz

    p = argparse.ArgumentParser("lidargs_tpu raydrop refiner")
    p.add_argument("--renders", required=True,
                   help="directory produced by --dump_renders")
    p.add_argument("--arch", choices=("mlp", "unet"), default="mlp",
                   help="mlp = the reference's tcnn frequency MLP "
                        "(extre_train_raydrop.py); unet = LiDAR4D's "
                        "attention UNet (scene/unet.py:139-171) on the "
                        "full [raydrop, intensity, depth] image")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--out", default=None)
    p.add_argument("--depth_scale", type=float, default=80.0)
    args = p.parse_args(argv)

    inten, depth, gt, rd = [], [], [], []
    for f in sorted(glob.glob(os.path.join(args.renders, "train_*.npy"))):
        d = np.load(f)                       # [6, H, W]
        inten.append(d[0])
        rd.append(d[1])
        depth.append(d[2] / args.depth_scale)
        gt.append(d[3])
    if args.arch == "unet":
        params, hist = train_unet_refiner(
            jax.random.key(0), np.stack(rd), np.stack(inten), np.stack(depth),
            np.stack(gt), epochs=args.epochs, lr=args.lr, log_every=5,
        )
    else:
        dirs = np.load(os.path.join(args.renders, "dir.npy")).reshape(-1, 3)
        flat = lambda xs: np.stack([x.reshape(-1) for x in xs])
        params, hist = train_raydrop_refiner(
            jax.random.key(0), dirs, flat(inten), flat(depth), flat(gt),
            epochs=args.epochs, lr=args.lr, log_every=5,
        )
    out = args.out or os.path.join(args.renders, "raydrop_refiner.npz")
    save_pytree_npz(out, params)
    print(f"{args.arch} refiner saved to {out}; final loss {hist[-1]:.6f}")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "refine":
        refine_main(sys.argv[2:])
    else:
        main()
