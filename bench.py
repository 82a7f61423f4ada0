"""End-of-round benchmark: Waymo-scale range-view render FPS on one chip.

Mirrors the reference's FPS measurement (train.py:408-462: wall-clock per
render() call — prefilter + MLP decode + splat — with device sync, mean of
1/t excluding 5 warmup frames) on the reference workload shape: 64x2650
range view (scene/dataset_readers.py:345-347), Scaffold-GS field with k=6
offsets per anchor.

Self-tuning: the surviving candidate fast paths (wide tiles tile_h=2/4/8
with matched K budgets and per-gaussian tile caps) are A/B'd against the
exact dense render each run. Rank-search emission (390 ms vs 16 ms dense),
the fused-gather windowed-DMA kernels (+1.7-5.5 ms at every tiling), and
chunk-length changes (noise: ch384 15.95 vs base 16.23 ms, r4 sweep) lost
their on-chip measurements and are out of the sweep — the numbers live
next to their config knobs (config.py:58-88) and in
tools/bench_render_ab.py. Every candidate (and the golden) compiles
under try/except: a Mosaic failure skips the variant, never sinks the run.
Acceptance = mean |Δcolor| vs a 2x-capacity golden no worse than base's,
plus a max-|Δ| backstop against localized corruption that a mean can hide.
Set BENCH_AUTOTUNE=0 for the plain baseline run (no golden, no variants),
or BENCH_VARIANT=<name> to force one candidate.

The reference repo publishes no numbers (BASELINE.md), so vs_baseline is
reported against the 10 Hz real-time bar of the Waymo LiDAR itself — the
paper's headline claim is "real-time" re-simulation (readme.md:1,28).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _require_tpu(timeout_s: float = 180.0) -> None:
    """Fail fast (instead of hanging forever) when the axon tunnel is down —
    jax.devices() blocks indefinitely against a dead tunnel."""
    import threading

    result = {}

    def probe():
        import jax

        try:
            result["devices"] = jax.devices()
        except Exception as e:           # noqa: BLE001 — report and exit
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        print(f"# TPU backend unreachable after {timeout_s:.0f}s — "
              "tunnel down, no benchmark possible", file=sys.stderr)
        raise SystemExit(3)
    if "error" in result:
        print(f"# TPU backend init failed: {result['error']}", file=sys.stderr)
        raise SystemExit(3)


def _time_fwd(fwd, args, n_iter: int, warmup: int = 5) -> float:
    import jax

    out = fwd(*args)
    jax.block_until_ready(out.color)
    for _ in range(warmup):
        out = fwd(*args)
    jax.block_until_ready(out.color)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(*args)
    jax.block_until_ready(out.color)
    return (time.perf_counter() - t0) / n_iter


def main() -> None:
    _require_tpu()

    import jax
    import jax.numpy as jnp

    from lidargs_tpu.config import ModelConfig, RasterConfig, replace
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations
    from lidargs_tpu.lidar.frames import LidarFrame
    from lidargs_tpu.models.field import init_field_params, render_field

    H, W = 64, 2650
    N_ANCHORS = 60_000
    mcfg = ModelConfig(anchor_capacity=65_536)
    # max_visible=2^17: with every tile saturated at tile_capacity=384 depth-
    # sorted instances, gaussians beyond the nearest ~131k never survive the
    # per-tile cut; halving the binning sort this way is worth +44% FPS at
    # mean |err| 4e-6 vs the 2^18 render (measured, see _bench notes).
    base_rcfg = RasterConfig(
        max_visible=2 ** 17,
        max_tiles_per_gaussian=16,
        tile_capacity=384,
        chunk=16,
    )

    # synthetic urban-ish scene: anchors on the sensor's visible shell
    rng = np.random.default_rng(0)
    az = rng.uniform(-np.pi, np.pi, N_ANCHORS)
    el = rng.uniform(np.radians(-20.0), np.radians(2.0), N_ANCHORS)
    r = rng.uniform(4.0, 75.0, N_ANCHORS)
    pts = np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)], -1
    ).astype(np.float32)

    params = init_field_params(jax.random.key(0), mcfg)
    C = mcfg.anchor_capacity
    params["anchor"] = params["anchor"].at[:N_ANCHORS].set(jnp.asarray(pts))
    scale = np.log(np.clip(r * 0.004, 0.02, 0.5)).astype(np.float32)
    params["scaling"] = params["scaling"].at[:N_ANCHORS].set(
        jnp.asarray(np.repeat(scale[:, None], 6, axis=1))
    )
    params["feat"] = params["feat"].at[:N_ANCHORS].set(
        jax.random.normal(jax.random.key(1), (N_ANCHORS, mcfg.feat_dim)) * 0.3
    )
    valid = jnp.arange(C) < N_ANCHORS

    beams = uniform_beam_inclinations(2.4, 20.9, H)  # Waymo-like vertical FOV
    gt = np.zeros((3, H, W), np.float32)
    frame = LidarFrame.from_lidar2world(np.eye(4), beams, gt, uid=0)
    bg = jnp.zeros((2,), jnp.float32)
    args = (params, valid, frame)

    def make_fwd(rcfg):
        return jax.jit(
            lambda p, v, f, rc=rcfg: render_field(p, v, f, mcfg, rc, bg)[0]
        )

    V = base_rcfg.max_visible
    # candidate fast paths, measured winners first (r4 on-chip sweeps,
    # tools/bench_render_ab.py, v5e 64x2650, base 16.39 ms MAE 1.73e-2).
    # Wider tiles collapse duplicate instance emission (one instance where
    # h1 emits up to tile_h), so they beat base on speed AND truncation
    # error; smaller per-gaussian tile caps then shrink the binning sort
    # (V*cap keys). Measured gated frontier: h4_K512_cap4 10.33 ms at
    # base-equivalent MAE 1.68e-2 (the expected winner), then quality-
    # increasing fallbacks h4_K640_cap4 11.15/1.03e-2, h4_K768_cap8
    # 12.40/6.18e-3, h8_K1024_cap4 13.48/5.40e-3. Sub-10 ms configs
    # (h4_K384_cap4 9.10, h4_K512_cap2 9.98) fail the quality gate.
    # wave-5 addition: wide tiles fill their per-tile budgets from the
    # nearest gaussians, so the far tail of the cull never survives the
    # per-tile cut — max_visible drops ride along free or nearly so
    # (V64k 9.29 ms MAE 1.77e-2, V96k 9.72 ms MAE 1.68e-2 == V131k's).
    variants = [
        ("h4_K512_cap4_V64k", dict(tile_h=4, tile_capacity=512,
                                   max_tiles_per_gaussian=4,
                                   max_visible=65536)),
        ("h4_K512_cap4_V96k", dict(tile_h=4, tile_capacity=512,
                                   max_tiles_per_gaussian=4,
                                   max_visible=98304)),
        ("h4_K640_cap4_V96k", dict(tile_h=4, tile_capacity=640,
                                   max_tiles_per_gaussian=4,
                                   max_visible=98304)),
        ("h4_K768_cap8", dict(tile_h=4, tile_capacity=768,
                              max_tiles_per_gaussian=8)),
    ]

    # exact dense render = correctness anchor + timing baseline
    fwd0 = make_fwd(base_rcfg)
    out0 = fwd0(*args)
    jax.block_until_ready(out0.color)
    n_vis = int(out0.visible.sum())
    occ = float(out0.occ.mean())
    base_dt = _time_fwd(fwd0, args, 12)
    print(f"# base      : {base_dt*1e3:7.2f} ms/frame  "
          f"overflow={int(out0.n_overflow)}", file=sys.stderr)

    best_name, best_fwd, best_dt = "base", fwd0, base_dt
    autotune = os.environ.get("BENCH_AUTOTUNE", "1") != "0"
    forced = os.environ.get("BENCH_VARIANT")
    if forced:
        variants = [v for v in variants if v[0] == forced]
    # the driver's bench timeout is unknown — stop starting new variants
    # once the tuning loop has spent its wall-clock budget (each tunnel
    # compile is ~30-90 s; the winner's numbers stay valid regardless).
    # The clock starts BEFORE the golden compile: it is part of the tune
    # cost, and a slow tunnel must not push the whole run past the driver.
    budget_s = float(os.environ.get("BENCH_TUNE_BUDGET_S", "420"))
    t_tune = time.perf_counter()

    # quality anchor: a 2x-capacity dense render. Per-tile truncation is
    # the ONLY thing the fast tilings change, and base itself truncates
    # (n_overflow above), so base is not a valid golden — a variant that
    # truncates LESS (h2 dedups instances spanning both beam rows) differs
    # from base on saturated tiles precisely where it is MORE correct.
    # Accept a variant iff it is no further from the high-capacity render
    # than base is (small slack) — plus a max-|Δ| backstop: a mean gate
    # alone would accept ~128 fully-corrupted pixels of 169600 — then pick
    # the fastest accepted. Only needed when variants will be tried; a
    # golden failure falls back to max|Δcolor|-vs-base gating (strict: it
    # rejects benign less-truncation differences, never corruption).
    golden_color, base_mae, base_max = None, None, None
    if autotune and variants:
        try:
            golden = make_fwd(
                replace(base_rcfg, tile_capacity=2 * base_rcfg.tile_capacity)
            )(*args)
            jax.block_until_ready(golden.color)
            golden_color = golden.color
            base_mae = float(jnp.abs(out0.color - golden_color).mean())
            base_max = float(jnp.abs(out0.color - golden_color).max())
            print(f"# golden(K{2*base_rcfg.tile_capacity}) overflow="
                  f"{int(golden.n_overflow)}  base MAE={base_mae:.2e} "
                  f"max={base_max:.2e}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — golden is optional
            msg = repr(e).replace("\n", " ")[:160]
            print(f"# golden render failed ({msg}) — falling back to "
                  f"max|d|-vs-base gate", file=sys.stderr)

    if autotune:
        for name, kw in variants:
            if time.perf_counter() - t_tune > budget_s:
                print(f"# tune budget ({budget_s:.0f}s) spent — "
                      f"skipping remaining variants", file=sys.stderr)
                break
            try:
                rcfg = replace(base_rcfg, **kw)
                fwd = make_fwd(rcfg)
                out = fwd(*args)
                jax.block_until_ready(out.color)
                if golden_color is not None:
                    err = float(jnp.abs(out.color - golden_color).mean())
                    errmax = float(jnp.abs(out.color - golden_color).max())
                    bad = (not np.isfinite(err) or err > base_mae * 1.05 + 1e-6
                           or not np.isfinite(errmax)
                           or errmax > max(2.0 * base_max, 1e-3))
                else:
                    err = errmax = float(jnp.abs(out.color - out0.color).max())
                    bad = not np.isfinite(err) or err > 1e-4
                if bad:
                    print(f"# {name:10s}: rejected, MAE-to-golden="
                          f"{err:.2e} max={errmax:.2e} "
                          f"overflow={int(out.n_overflow)}", file=sys.stderr)
                    continue
                dt = _time_fwd(fwd, args, 12, warmup=3)
                print(f"# {name:10s}: {dt*1e3:7.2f} ms/frame  "
                      f"MAE-to-golden={err:.2e}  overflow={int(out.n_overflow)}", file=sys.stderr)
                if dt < best_dt:
                    best_name, best_fwd, best_dt = name, fwd, dt
            except Exception as e:  # noqa: BLE001 — skip broken variant
                msg = repr(e).replace("\n", " ")[:160]
                print(f"# {name:10s}: skipped ({msg})", file=sys.stderr)

    # final measurement on the winner (reference excludes 5 warmup frames)
    dt = _time_fwd(best_fwd, args, 30)

    fps = 1.0 / dt
    rays_per_s = H * W * fps
    best_kw = next((kw2 for nm, kw2 in variants if nm == best_name), {})
    win_rcfg = replace(base_rcfg, **best_kw)
    try:  # % of speed-of-light at the WINNER's live pipeline shape
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from roofline import bench_stages

        sol_stages = bench_stages(
            visible=n_vis, tile_h=win_rcfg.tile_h,
            tile_capacity=win_rcfg.tile_capacity,
            max_tiles_per_gaussian=win_rcfg.max_tiles_per_gaussian,
            max_visible=win_rcfg.max_visible)
        sol_ms = sum(s["sol_s"] for s in sol_stages) * 1e3
        print(f"# SoL(stage-sum)={sol_ms:.2f} ms -> "
              f"{100.0 * sol_ms / (dt * 1e3):.1f}% of speed-of-light",
              file=sys.stderr)
    except Exception:  # noqa: BLE001 — diagnostics only
        sol_stages = None

    # Per-stage measured-vs-SoL table for the winner (VERDICT r4 #7).
    # Cumulative-prefix timing on the fetch-synced scan protocol
    # (tools/chiptime.py: block_until_ready is a no-op for the non-pallas
    # prefixes on this backend). One compile per prefix (k replications
    # inside one program; fixed overhead ~latency/k rides along, so the
    # table slightly OVERSTATES each prefix — deltas are unaffected).
    if (os.environ.get("BENCH_STAGE_SPLIT", "1") != "0"
            and sol_stages is not None
            and time.perf_counter() - t_tune < budget_s):
        try:
            from chiptime import measure_fetch, null_latency
            from prefixes import make_prefixes

            k_rep = 8
            lat = null_latency()

            def prefix_ms(fn):
                @jax.jit
                def run(p, v, f):
                    def body(c, _):
                        q = dict(p)
                        q["anchor"] = p["anchor"] + c * 1e-30
                        return fn(q, v, f) * 1e-30, None
                    c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=k_rep)
                    return c
                return max(measure_fetch(run, *args, n=7) - lat, 0.0) / k_rep

            cum = [(nm, prefix_ms(fn)) for nm, fn in
                   make_prefixes(mcfg, win_rcfg, H, W)]
            cum.append(("composite (full frame)", dt * 1e3))
            # group roofline stages to match the prefix deltas
            groups = ([0, 1], [2, 3], [4], [5], [6])
            prev = 0.0
            for (nm, t), idx in zip(cum, groups):
                sol = sum(sol_stages[i]["sol_s"] for i in idx) * 1e3
                d = t - prev
                prev = t
                print(f"# stage {nm:24s}: {d:6.2f} ms  SoL {sol:5.2f} ms "
                      f"({d / max(sol, 1e-9):5.1f}x)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — diagnostics only
            msg = repr(e).replace("\n", " ")[:120]
            print(f"# stage split skipped ({msg})", file=sys.stderr)
    # Street-like scene: anchors along a 300 m road corridor with the
    # sensor at one end, so only ~half survive the near/far prefilter —
    # the regime where compact-then-decode (visible_anchor_cap) can win
    # (VERDICT r4 #1: the shell scene structurally cannot reward it; the
    # r4 compact-then-decode rejection was measured only there). Printed
    # to stderr so decode-path wins are tracked by the round gate.
    if (os.environ.get("BENCH_STREET", "1") != "0"
            and time.perf_counter() - t_tune < budget_s + 300):
        try:
            rng_s = np.random.default_rng(7)
            xs = rng_s.uniform(-20.0, 300.0, N_ANCHORS)
            side = rng_s.choice([-1.0, 1.0], N_ANCHORS)
            ys = side * rng_s.uniform(4.0, 14.0, N_ANCHORS)
            # z from an in-band elevation sample so the near/far cull (not
            # the beam-row cull) decides visibility — the corridor length
            # vs far=80 sets the ~1/3-visible street regime
            horiz = np.sqrt(xs * xs + ys * ys)
            el_s = rng_s.uniform(np.radians(-18.0), np.radians(1.5),
                                 N_ANCHORS)
            zs = horiz * np.tan(el_s)
            pts_s = np.stack([xs, ys, zs], -1).astype(np.float32)
            params_s = dict(params)
            params_s["anchor"] = params["anchor"].at[:N_ANCHORS].set(
                jnp.asarray(pts_s))
            rr = np.maximum(np.linalg.norm(pts_s, axis=1), 2.0)
            sc = np.log(np.clip(rr * 0.004, 0.02, 0.5)).astype(np.float32)
            params_s["scaling"] = params["scaling"].at[:N_ANCHORS].set(
                jnp.asarray(np.repeat(sc[:, None], 6, axis=1)))
            args_s = (params_s, valid, frame)

            fwd_w = make_fwd(win_rcfg)
            out_w = fwd_w(*args_s)
            jax.block_until_ready(out_w.color)
            nvis_s = int(out_w.visible.sum())
            dt_w = _time_fwd(fwd_w, args_s, 12, warmup=3)
            print(f"# street    : {dt_w*1e3:7.2f} ms/frame  "
                  f"visible={nvis_s} "
                  f"({100.0*nvis_s/(N_ANCHORS*mcfg.n_offsets):.0f}% of "
                  f"decoded)", file=sys.stderr)
            cap = 32768
            fwd_c = make_fwd(replace(win_rcfg, visible_anchor_cap=cap))
            out_c = fwd_c(*args_s)
            jax.block_until_ready(out_c.color)
            err_c = float(jnp.abs(out_c.color - out_w.color).max())
            dt_c = _time_fwd(fwd_c, args_s, 12, warmup=3)
            verdict = ("wins" if dt_c < dt_w and err_c < 1e-4 else "loses")
            print(f"# street+cap{cap//1024}k: {dt_c*1e3:7.2f} ms/frame  "
                  f"max|d|={err_c:.2e}  -> compact-then-decode {verdict}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — diagnostics only
            msg = repr(e).replace("\n", " ")[:120]
            print(f"# street scene skipped ({msg})", file=sys.stderr)

    result = {
        "metric": "render_fps_64x2650_scaffold_k6",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),  # 10 Hz LiDAR real-time bar
    }
    print(
        f"# winner={best_name}  {n_vis} visible gaussians, mean occ {occ:.3f}, "
        f"{rays_per_s/1e6:.1f} Mrays/s, {dt*1e3:.2f} ms/frame",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
