"""Per-stage timing of the render pipeline at bench scale (the DESIGN.md §7
stage table, reproducible in one command on the real chip).

Per-stage jits carry ~0.5-1 ms dispatch overhead each through the tunnel
(axon), so stage times overstate small stages — trust the fused frame for
totals and the deltas between configs for decisions.

--prefix mode fixes that: it times CUMULATIVE pipeline prefixes (each one
fused jit, one dispatch), so the DELTA between consecutive prefixes is the
true incremental cost of a stage under full XLA fusion — the standalone
stage numbers above never sum to the fused frame (r4: 21 ms of stages vs a
16 ms frame).

--train mode decomposes the full train step the same way (VERDICT r3 #9):
forward+loss value, +grad, +adam, full step with densify stats.

    PYTHONPATH=. python tools/stage_split.py [--tile_h 2] [--fused]
        [--instance_capacity N] [--prefix] [--train]
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
    ap.add_argument("--max_tiles_per_gaussian", type=int, default=16)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--instance_capacity", type=int, default=0)
    ap.add_argument("--anchors", type=int, default=60_000)
    ap.add_argument("--anchor_capacity", type=int, default=65_536)
    ap.add_argument("--W", type=int, default=2650)
    ap.add_argument("--n", type=int, default=20, help="timing iterations")
    ap.add_argument("--json", default=None,
                    help="also dump {stage: ms} json (tools/roofline.py "
                         "--stage-split input)")
    ap.add_argument("--prefix", action="store_true",
                    help="cumulative-prefix timing: true incremental stage "
                         "costs under full fusion (deltas between prefixes)")
    ap.add_argument("--train", action="store_true",
                    help="decompose the full train step: fwd+loss, +grad, "
                         "+adam, +stats")
    ap.add_argument("--grad-prefix", action="store_true",
                    help="cumulative-prefix timing of value_and_grad of "
                         "each pipeline prefix: deltas = fwd+bwd cost per "
                         "stage (subtract the --prefix fwd deltas for the "
                         "backward-only split)")
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

    H, W = 64, args.W
    N = args.anchors
    global timeit
    _timeit = timeit
    timeit = lambda fn, *a, n=args.n, warmup=3: _timeit(fn, *a, n=n, warmup=warmup)
    mcfg = ModelConfig(anchor_capacity=args.anchor_capacity)
    rcfg = RasterConfig(
        max_visible=2 ** 17,
        max_tiles_per_gaussian=args.max_tiles_per_gaussian,
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

    if args.prefix or args.grad_prefix:
        # cumulative prefixes of the exact render_field/render_tiled
        # pipeline — every prefix is ONE fused jit ending in a tiny
        # reduction (keeps all outputs live, adds negligible cost), so
        # consecutive deltas are true incremental stage costs
        from lidargs_tpu.ops.rasterize import render_tiled

        C2 = 2
        V = min(rcfg.max_visible, mcfg.anchor_capacity * mcfg.n_offsets)
        gy, gx = rcfg.grid_shape(H, W)

        def upto_prefilter(p, v, f):
            return prefilter_anchors(p, v, f, rcfg).sum()

        def _ng(p, v, f):
            av = prefilter_anchors(p, v, f, rcfg)
            return generate_neural_gaussians(p, v, av, f.center, mcfg,
                                             cam_uid=f.uid)

        def upto_decode(p, v, f):
            ng = _ng(p, v, f)
            return sum(jnp.sum(x) for x in
                       (ng.xyz, ng.feat, ng.opacity, ng.scaling, ng.rot))

        def _pk(p, v, f):
            ng = _ng(p, v, f)
            fl = lambda x: x.reshape((-1,) + x.shape[2:])
            # flatten at the projection boundary, like render_field
            return pack_splats(preprocess_gaussians(
                fl(ng.xyz), fl(ng.scaling), fl(ng.rot),
                fl(ng.opacity), fl(ng.feat), fl(ng.mask),
                f.w2s_rot, f.w2s_trans, f.beams, f.W, rcfg))

        def upto_project(p, v, f):
            return jnp.sum(_pk(p, v, f), axis=0)        # all cols live

        def _pkv(p, v, f):
            from lidargs_tpu.ops.rasterize import permutation_rows

            pk = _pk(p, v, f)
            _, sel = jax.lax.sort(
                (pk[:, PackedCols.DEPTH],
                 jnp.arange(pk.shape[0], dtype=jnp.int32)),
                num_keys=1, is_stable=True)
            return permutation_rows(pk, sel, V)   # production cull path

        def upto_cull(p, v, f):
            return jnp.sum(_pkv(p, v, f), axis=0)

        def upto_bin(p, v, f):
            pkv = _pkv(p, v, f)
            ids, counts, ovf = bin_instances(
                pkv[:, PackedCols.rect(C2)].astype(jnp.int32),
                pkv[:, PackedCols.center(C2)],
                pkv[:, PackedCols.validf(C2)] > 0.0, rcfg, gx, gy)
            return jnp.sum(ids) + jnp.sum(counts) + ovf

        def upto_gather(p, v, f):
            pkv = _pkv(p, v, f)
            ids, counts, ovf = bin_instances(
                pkv[:, PackedCols.rect(C2)].astype(jnp.int32),
                pkv[:, PackedCols.center(C2)],
                pkv[:, PackedCols.validf(C2)] > 0.0, rcfg, gx, gy)
            inst = jnp.take(pkv, ids.reshape(-1), axis=0, mode="clip")
            return jnp.sum(inst) + jnp.sum(counts) + ovf

        stages = (
            ("prefilter", upto_prefilter), ("decode", upto_decode),
            ("project+pack", upto_project), ("cull sort", upto_cull),
            ("bin sort", upto_bin), ("gather", upto_gather),
        )
        if args.prefix:
            prev = 0.0
            for name, fn in stages:
                t, _ = timeit(jax.jit(fn), params, valid, frame)
                stage_ms[f"prefix {name}"] = t
                print(f"upto {name:15s}: {t:7.2f} ms  (+{t - prev:6.2f})")
                prev = t
            print(f"upto composite (full): {t_full:7.2f} ms  "
                  f"(+{t_full - prev:6.2f})")

        if args.grad_prefix:
            # fwd+bwd of each prefix: the delta between consecutive rows is
            # that stage's forward AND backward cost together (backward of
            # a gather = scatter-add, of a sort-selection = inverse gather,
            # of the composite = the bwd pallas kernel). Scalar-safe float
            # heads only (prefilter/bin counts are int -> no grad surface).
            def g_decode(p, v, f):
                return upto_decode(p, v, f)

            def g_project(p, v, f):
                return jnp.sum(_pk(p, v, f))

            def g_cull(p, v, f):
                return jnp.sum(_pkv(p, v, f))

            def g_gather(p, v, f):
                pkv = _pkv(p, v, f)
                ids, counts, ovf = bin_instances(
                    pkv[:, PackedCols.rect(C2)].astype(jnp.int32),
                    pkv[:, PackedCols.center(C2)],
                    pkv[:, PackedCols.validf(C2)] > 0.0, rcfg, gx, gy)
                inst = jnp.take(pkv, ids.reshape(-1), axis=0, mode="clip")
                return jnp.sum(inst)

            def g_full(p, v, f):
                out = render_field(p, v, f, mcfg, rcfg, bg)[0]
                return (jnp.sum(out.color) + jnp.sum(out.depth)
                        + jnp.sum(out.occ))

            prev = 0.0
            for name, fn in (("decode", g_decode), ("project+pack", g_project),
                             ("cull", g_cull), ("gather", g_gather),
                             ("composite (full)", g_full)):
                g = jax.jit(jax.grad(fn))
                t, _ = timeit(g, params, valid, frame)
                stage_ms[f"grad-prefix {name}"] = t
                print(f"grad upto {name:17s}: {t:7.2f} ms  (+{t - prev:6.2f})")
                prev = t

    if args.train:
        # train-step decomposition (VERDICT r3 #9): the same cumulative-
        # prefix idea over fwd+loss -> +grad -> +adam -> full step w/ stats
        from lidargs_tpu.config import OptConfig
        from lidargs_tpu.models.field import AnchorField
        from lidargs_tpu.train.trainer import (
            Trainer, frame_loss, init_train_state, train_step,
        )

        ocfg = OptConfig()
        state = init_train_state(
            AnchorField(params=params, valid=valid, voxel_size=0.35), mcfg)
        k = mcfg.n_offsets
        proxy0 = jnp.zeros((mcfg.anchor_capacity * k, 3), jnp.float32)

        def fwd_loss(st, f):
            total, _ = frame_loss(st.params, proxy0, st.valid, st.step, f,
                                  bg, mcfg, rcfg, ocfg)
            return total

        def fwd_grad(st, f):
            (total, _), (g, pg) = jax.value_and_grad(
                lambda p, pr: frame_loss(p, pr, st.valid, st.step, f, bg,
                                         mcfg, rcfg, ocfg),
                argnums=(0, 1), has_aux=True)(st.params, proxy0)
            return (total + jnp.sum(pg)
                    + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)))

        step_nostats = jax.jit(lambda st, f: train_step(
            st, f, bg=bg, mcfg=mcfg, rcfg=rcfg, ocfg=ocfg,
            update_stats=False))
        step_full = jax.jit(lambda st, f: train_step(
            st, f, bg=bg, mcfg=mcfg, rcfg=rcfg, ocfg=ocfg))

        rows = [("render fwd", full, (params, valid, frame)),
                ("fwd + loss", jax.jit(fwd_loss), (state, frame)),
                ("fwd + loss + grad", jax.jit(fwd_grad), (state, frame)),
                ("full step (no stats)", step_nostats, (state, frame)),
                ("full step (stats)", step_full, (state, frame))]
        prev = 0.0
        for name, fn, fa in rows:
            t, _ = timeit(fn, *fa, n=10)
            stage_ms[f"train {name}"] = t
            print(f"{name:21s}: {t:7.2f} ms  (+{t - prev:6.2f})")
            prev = t

    if args.prefix or args.train or args.grad_prefix:
        if args.json:
            import json as _json
            with open(args.json, "w") as f:
                _json.dump(stage_ms, f, indent=1)
            print(f"stage json -> {args.json}")
        return

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

    _fl = lambda x: x.reshape((-1,) + x.shape[2:])
    proj = jax.jit(lambda ng, f: pack_splats(preprocess_gaussians(
        _fl(ng.xyz), _fl(ng.scaling), _fl(ng.rot),
        _fl(ng.opacity), _fl(ng.feat), _fl(ng.mask),
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
