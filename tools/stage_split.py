"""Per-stage timing of the render pipeline at bench scale (the DESIGN.md §7
stage table, reproducible in one command on the real chip).

Per-stage jits carry ~0.5-1 ms dispatch overhead each through the tunnel
(axon), so stage times overstate small stages — trust the fused frame for
totals and the deltas between configs for decisions.

    PYTHONPATH=. python tools/stage_split.py [--tile_h 2] [--fused]
        [--instance_capacity N]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile_h", type=int, default=1)
    ap.add_argument("--tile_capacity", type=int, default=0,
                    help="0 = 384 * tile_h")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--instance_capacity", type=int, default=0)
    ap.add_argument("--anchors", type=int, default=60_000)
    ap.add_argument("--json", default=None,
                    help="also dump {stage: ms} json (tools/roofline.py "
                         "--stage-split input)")
    args = ap.parse_args()
    stage_ms = {}

    import jax
    import jax.numpy as jnp

    from lidargs_tpu.config import ModelConfig, RasterConfig
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations
    from lidargs_tpu.lidar.frames import LidarFrame
    from lidargs_tpu.models.field import (
        generate_neural_gaussians, init_field_params, prefilter_anchors,
        render_field,
    )
    from lidargs_tpu.ops.projection import PackedCols, pack_splats, preprocess_gaussians
    from lidargs_tpu.ops.rasterize import (
        bin_instances, bin_instances_windows, render_packed_window,
    )

    H, W = 64, 2650
    N = args.anchors
    mcfg = ModelConfig(anchor_capacity=65_536)
    rcfg = RasterConfig(
        max_visible=2 ** 17, max_tiles_per_gaussian=16,
        tile_capacity=args.tile_capacity or 384 * args.tile_h,
        chunk=16, tile_h=args.tile_h, fused_gather=args.fused,
        instance_capacity=args.instance_capacity,
    )
    rng = np.random.default_rng(0)
    az = rng.uniform(-np.pi, np.pi, N)
    el = rng.uniform(np.radians(-20.0), np.radians(2.0), N)
    r = rng.uniform(4.0, 75.0, N)
    pts = np.stack([r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
                    r * np.sin(el)], -1).astype(np.float32)
    params = init_field_params(jax.random.key(0), mcfg)
    params["anchor"] = params["anchor"].at[:N].set(jnp.asarray(pts))
    scale = np.log(np.clip(r * 0.004, 0.02, 0.5)).astype(np.float32)
    params["scaling"] = params["scaling"].at[:N].set(
        jnp.asarray(np.repeat(scale[:, None], 6, axis=1)))
    params["feat"] = params["feat"].at[:N].set(
        jax.random.normal(jax.random.key(1), (N, mcfg.feat_dim)) * 0.3)
    valid = jnp.arange(mcfg.anchor_capacity) < N
    beams = uniform_beam_inclinations(2.4, 20.9, H)
    frame = LidarFrame.from_lidar2world(
        np.eye(4), beams, np.zeros((3, H, W), np.float32), uid=0)
    bg = jnp.zeros((2,), jnp.float32)

    # fused frame first — the number that matters
    full = jax.jit(lambda p, v, f: render_field(p, v, f, mcfg, rcfg, bg)[0])
    t_full, out = timeit(full, params, valid, frame)
    stage_ms["full_frame"] = t_full
    print(f"FULL frame          : {t_full:7.2f} ms  ({1e3/t_full:5.1f} FPS)  "
          f"overflow={int(out.n_overflow)}")

    # stages
    pf = jax.jit(lambda p, v, f: prefilter_anchors(p, v, f, rcfg))
    t, av = timeit(pf, params, valid, frame)
    stage_ms["prefilter"] = t
    print(f"prefilter           : {t:7.2f} ms")

    dec = jax.jit(lambda p, v, a, f: generate_neural_gaussians(
        p, v, a, f.center, mcfg, cam_uid=f.uid))
    t, ng = timeit(dec, params, valid, av, frame)
    stage_ms["mlp decode"] = t
    print(f"MLP decode          : {t:7.2f} ms")

    proj = jax.jit(lambda ng, f: pack_splats(preprocess_gaussians(
        ng.xyz, ng.scaling, ng.rot, ng.opacity, ng.feat, ng.mask,
        f.w2s_rot, f.w2s_trans, f.beams, f.W, rcfg)))
    t, pk = timeit(proj, ng, frame)
    stage_ms["projection"] = t
    print(f"projection+pack     : {t:7.2f} ms")

    V = min(rcfg.max_visible, pk.shape[0])
    cull = jax.jit(lambda pk: jnp.take(
        pk, jax.lax.sort((pk[:, PackedCols.DEPTH],
                          jnp.arange(pk.shape[0], dtype=jnp.int32)),
                         num_keys=1, is_stable=True)[1][:V], axis=0))
    t, pkv = timeit(cull, pk)
    stage_ms["cull"] = t
    print(f"cull sort           : {t:7.2f} ms")

    C = 2
    gy, gx = rcfg.grid_shape(H, W)
    rect = pkv[:, PackedCols.rect(C)].astype(jnp.int32)
    center = pkv[:, PackedCols.center(C)]
    vv = pkv[:, PackedCols.validf(C)] > 0.0
    if args.fused:
        binf = jax.jit(lambda r, c, v: bin_instances_windows(
            r, c, v, rcfg, gx, gy))
        t, (gid, starts, counts, ovf) = timeit(binf, rect, center, vv)
        stage_ms["instance emission"] = t
        print(f"binning (windows)   : {t:7.2f} ms  overflow={int(ovf)}")
        gat = jax.jit(lambda pk, g: jnp.take(pk, g, axis=0, mode="clip"))
        t, _ = timeit(gat, pkv, gid)
        stage_ms["instance gather"] = t
        print(f"dense buf gather    : {t:7.2f} ms")
    else:
        binf = jax.jit(lambda r, c, v: bin_instances(r, c, v, rcfg, gx, gy))
        t, (ids, counts, ovf) = timeit(binf, rect, center, vv)
        stage_ms["instance emission"] = t
        print(f"binning (ids)       : {t:7.2f} ms  overflow={int(ovf)}")
        gat = jax.jit(lambda pk, i: jnp.take(
            pk, i.reshape(-1), axis=0, mode="clip"))
        t, _ = timeit(gat, pkv, ids)
        stage_ms["instance gather"] = t
        print(f"instance gather     : {t:7.2f} ms")

    comp = jax.jit(lambda pkv, f: render_packed_window(
        pkv, f.beams, f.W, rcfg, C))
    t, _ = timeit(comp, pkv, frame)
    stage_ms["pallas composite"] = t
    print(f"bin+gather+composite: {t:7.2f} ms")

    if args.json:
        import json as _json
        with open(args.json, "w") as f:
            _json.dump(stage_ms, f, indent=1)
        print(f"stage json -> {args.json}")


if __name__ == "__main__":
    main()
