"""Full-frame render A/B across raster configs, one TPU session.

Per-stage timings through the tunnel are dispatch-inflated (stage sums ~2x
the fused frame), so every decision here is a FULL-frame delta at the bench
workload (64x2650, 60k anchors, k=6), each variant gated on MAE to a
2x-capacity golden exactly like bench.py. Variants compile under try/except
so one Mosaic failure never sinks the session.

    PYTHONPATH=. python tools/bench_render_ab.py [--variants a,b,...]

Motivating hypothesis (r4): the pallas composite is bound by the LATENCY of
the sequential per-chunk dependency chain, not VPU throughput — the r1
chunk sweep improved monotonically 16->128 and never tried 192/384, ch64
lost, and tile_h=2 (which widens every op to 256 lanes and halves the
serialized chunk count) was the only measured win. If that is right, the
levers are longer chunks, wider tiles, and batching tiles into one op —
not fewer ops per chunk.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build(n_anchors=60_000, H=64, W=2650):
    import jax
    import jax.numpy as jnp

    from lidargs_tpu.config import ModelConfig
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations
    from lidargs_tpu.lidar.frames import LidarFrame
    from lidargs_tpu.models.field import init_field_params

    mcfg = ModelConfig(anchor_capacity=65_536)
    rng = np.random.default_rng(0)
    az = rng.uniform(-np.pi, np.pi, n_anchors)
    el = rng.uniform(np.radians(-20.0), np.radians(2.0), n_anchors)
    r = rng.uniform(4.0, 75.0, n_anchors)
    pts = np.stack([r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
                    r * np.sin(el)], -1).astype(np.float32)
    params = init_field_params(jax.random.key(0), mcfg)
    params["anchor"] = params["anchor"].at[:n_anchors].set(jnp.asarray(pts))
    scale = np.log(np.clip(r * 0.004, 0.02, 0.5)).astype(np.float32)
    params["scaling"] = params["scaling"].at[:n_anchors].set(
        jnp.asarray(np.repeat(scale[:, None], 6, axis=1)))
    params["feat"] = params["feat"].at[:n_anchors].set(
        jax.random.normal(jax.random.key(1), (n_anchors, mcfg.feat_dim)) * 0.3)
    valid = jnp.arange(mcfg.anchor_capacity) < n_anchors
    beams = uniform_beam_inclinations(2.4, 20.9, H)
    frame = LidarFrame.from_lidar2world(
        np.eye(4), beams, np.zeros((3, H, W), np.float32), uid=0)
    bg = jnp.zeros((2,), jnp.float32)
    return mcfg, params, valid, frame, bg


def timeit(fn, args, n=20, warmup=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out.color)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out.color)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out.color)
    return (time.perf_counter() - t0) / n * 1e3, out


# name -> RasterConfig overrides. Every variant keeps the bench baseline
# max_visible=2^17 / cap=16 unless it is the thing under test.
VARIANTS = {
    "base":      dict(),
    "ch192":     dict(pallas_chunk=192),
    "ch384":     dict(pallas_chunk=384),
    "ch64":      dict(pallas_chunk=64),
    "h2_K384":   dict(tile_h=2, tile_capacity=384),
    "h2_K512":   dict(tile_h=2, tile_capacity=512),
    "h2_K768":   dict(tile_h=2, tile_capacity=768),
    "h2_K512_ch256": dict(tile_h=2, tile_capacity=512, pallas_chunk=256),
    "h2_K512_ch512": dict(tile_h=2, tile_capacity=512, pallas_chunk=512),
    "h4_K768":   dict(tile_h=4, tile_capacity=768),
    "h4_K768_ch384": dict(tile_h=4, tile_capacity=768, pallas_chunk=384),
    "h2_cap8_K512":  dict(tile_h=2, tile_capacity=512,
                          max_tiles_per_gaussian=8),
    "cap12":     dict(max_tiles_per_gaussian=12),
    "h2_K512_ch512_cap8": dict(tile_h=2, tile_capacity=512, pallas_chunk=512,
                               max_tiles_per_gaussian=8),
    # r4 second wave: tile_h=8 = eight native (8,128) VPU tiles per op.
    # Wider tiles collapse duplicate emission (one instance where h1 emits
    # up to 8), so K shrinks per covered pixel AND the per-gaussian tile cap
    # can drop (most rects now span 1 tile-row) — cutting the binning sort
    # (V*cap keys) proportionally.
    "h8_K1024":       dict(tile_h=8, tile_capacity=1024),
    "h8_K1024_cap8":  dict(tile_h=8, tile_capacity=1024,
                           max_tiles_per_gaussian=8),
    "h8_K1024_cap4":  dict(tile_h=8, tile_capacity=1024,
                           max_tiles_per_gaussian=4),
    "h8_K1536_cap8":  dict(tile_h=8, tile_capacity=1536,
                           max_tiles_per_gaussian=8),
    "h8_K768_cap4":   dict(tile_h=8, tile_capacity=768,
                           max_tiles_per_gaussian=4),
    "h4_K768_cap8":   dict(tile_h=4, tile_capacity=768,
                           max_tiles_per_gaussian=8),
    "h8_K1024_cap4_ch512": dict(tile_h=8, tile_capacity=1024,
                                max_tiles_per_gaussian=4, pallas_chunk=512),
    # r4 third wave: refine around the first h8/h4 frontier (h8_K768_cap4
    # 12.00 ms / MAE 1.17e-2; h4_K768_cap8 12.40 ms / MAE 6.18e-3)
    "h4_K512_cap8":   dict(tile_h=4, tile_capacity=512,
                           max_tiles_per_gaussian=8),
    "h4_K512_cap4":   dict(tile_h=4, tile_capacity=512,
                           max_tiles_per_gaussian=4),
    "h4_K640_cap8":   dict(tile_h=4, tile_capacity=640,
                           max_tiles_per_gaussian=8),
    "h4_K768_cap4":   dict(tile_h=4, tile_capacity=768,
                           max_tiles_per_gaussian=4),
    "h8_K768_cap8":   dict(tile_h=8, tile_capacity=768,
                           max_tiles_per_gaussian=8),
    "h4_K768_cap8_ch256": dict(tile_h=4, tile_capacity=768,
                               max_tiles_per_gaussian=8, pallas_chunk=256),
    # r4 fourth wave: probe the speed end below the h4_K512_cap4 winner
    # (10.33 ms / MAE 1.68e-2 ~= base quality) and the K 512-768 gap
    "h4_K384_cap4":   dict(tile_h=4, tile_capacity=384,
                           max_tiles_per_gaussian=4),
    "h8_K512_cap4":   dict(tile_h=8, tile_capacity=512,
                           max_tiles_per_gaussian=4),
    "h4_K640_cap4":   dict(tile_h=4, tile_capacity=640,
                           max_tiles_per_gaussian=4),
    "h8_K640_cap4":   dict(tile_h=8, tile_capacity=640,
                           max_tiles_per_gaussian=4),
    "h4_K512_cap2":   dict(tile_h=4, tile_capacity=512,
                           max_tiles_per_gaussian=2),
    # r4 fifth wave: max_visible reduction on top of the wide-tile winners
    # (wide tiles saturate their per-tile budgets from the nearest
    # gaussians, so the far tail of the 131k-row cull may never survive
    # the per-tile cut — if so, a smaller V shrinks cull+bin+gather free)
    "h4_K512_cap4_V96k": dict(tile_h=4, tile_capacity=512,
                              max_tiles_per_gaussian=4, max_visible=98304),
    "h4_K512_cap4_V64k": dict(tile_h=4, tile_capacity=512,
                              max_tiles_per_gaussian=4, max_visible=65536),
    "h4_K640_cap4_V96k": dict(tile_h=4, tile_capacity=640,
                              max_tiles_per_gaussian=4, max_visible=98304),
    "h4_K768_cap8_V96k": dict(tile_h=4, tile_capacity=768,
                              max_tiles_per_gaussian=8, max_visible=98304),
    # r4 sixth wave: compact-then-decode. MEASURED: LOSES at this scene
    # (CA40k: +0.7 ms, MAE 3.2e-2 — the visible shell keeps >40k anchors
    # prefilter-visible so the cap drops real anchors); kept for re-testing
    # on real street-like scenes (~46% visible fraction)
    "h4_K512_cap4_V64k_CA40k": dict(tile_h=4, tile_capacity=512,
                                    max_tiles_per_gaussian=4,
                                    max_visible=65536,
                                    visible_anchor_cap=40960),
    "h4_K512_cap4_V96k_CA40k": dict(tile_h=4, tile_capacity=512,
                                    max_tiles_per_gaussian=4,
                                    max_visible=98304,
                                    visible_anchor_cap=40960),
    "h4_K768_cap8_CA40k": dict(tile_h=4, tile_capacity=768,
                               max_tiles_per_gaussian=8,
                               visible_anchor_cap=40960),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=None,
                    help="comma list (default: all)")
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidargs_tpu.config import RasterConfig, replace
    from lidargs_tpu.models.field import render_field

    mcfg, params, valid, frame, bg = build()
    base_rcfg = RasterConfig(max_visible=2 ** 17, max_tiles_per_gaussian=16,
                             tile_capacity=384, chunk=16)
    fa = (params, valid, frame)

    def make(rcfg):
        return jax.jit(lambda p, v, f, rc=rcfg:
                       render_field(p, v, f, mcfg, rc, bg)[0])

    names = list(VARIANTS) if args.variants is None else args.variants.split(",")

    # golden: 2x-capacity dense render (see bench.py for why base itself is
    # not a valid truncation reference)
    golden = make(replace(base_rcfg, tile_capacity=768))(*fa)
    jax.block_until_ready(golden.color)

    results = {}
    for name in names:
        kw = VARIANTS[name]
        t0 = time.perf_counter()
        try:
            fwd = make(replace(base_rcfg, **kw))
            out = fwd(*fa)
            jax.block_until_ready(out.color)
            tc = time.perf_counter() - t0
            mae = float(jnp.abs(out.color - golden.color).mean())
            mx = float(jnp.abs(out.color - golden.color).max())
            dt, out = timeit(fwd, fa, n=args.n)
            results[name] = dt
            print(f"{name:22s}: {dt:7.2f} ms  MAE={mae:.2e} max={mx:.2e} "
                  f"overflow={int(out.n_overflow):8d}  (compile {tc:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping
            msg = repr(e).replace("\n", " ")[:140]
            print(f"{name:22s}: FAILED {msg}", flush=True)
    if results:
        win = min(results, key=results.get)
        print(f"winner: {win}  {results[win]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
