"""Speed-of-light (roofline) estimates per render stage at bench scale.

VERDICT r2 #6: give DESIGN.md §7 a speed-of-light column so "is it
actually fast" is a measured multiple, not a guess. Each stage gets the
two classic ceilings:

  * HBM bytes moved / 819 GB/s   (v5e HBM bandwidth)
  * f32 VPU ops / 3.9 Top/s      (8 sublanes x 128 lanes x 4 ALUs x 940 MHz)
  * bf16 MXU flops / 197 Tflop/s (for the GEMM decode)

and SoL = max of the ceilings that apply. Sorts are reported against their
one-pass data-touch SoL (read+write once): XLA's TPU sort is a multi-pass
bitonic network, so its *achievable* bound is a O(log^2 N) multiple of
that — the printed multiple vs one-pass makes the sort's intrinsic
overhead visible instead of hiding it in a generous bound.

Counts (visible gaussians, instances) change with the scene; defaults are
the bench-scale probe measurements (round-2 CPU probe: 1.35M instances =
10.3 tiles/gaussian at 131k visible). Pass --stage-split <json> (the
output of tools/stage_split.py) to print measured-vs-SoL multiples.

Usage:
    python tools/roofline.py [--visible 131072] [--instances 1350000]
                             [--stage-split /tmp/stages.json]
"""
from __future__ import annotations

import argparse
import json

HBM_GBS = 819e9          # v5e HBM bandwidth, bytes/s
VPU_OPS = 3.9e12         # f32 VPU ops/s (8 x 128 x 4 ALUs x 940 MHz)
MXU_FLOPS = 197e12       # bf16 MXU flops/s


def fmt_us(s: float) -> str:
    return f"{s * 1e6:8.1f} us"


def stage(name, bytes_moved=0.0, vpu_ops=0.0, mxu_flops=0.0, note=""):
    t_mem = bytes_moved / HBM_GBS
    t_vpu = vpu_ops / VPU_OPS
    t_mxu = mxu_flops / MXU_FLOPS
    sol = max(t_mem, t_vpu, t_mxu)
    bound = ("HBM" if sol == t_mem else "VPU" if sol == t_vpu else "MXU")
    return dict(name=name, bytes=bytes_moved, vpu=vpu_ops, mxu=mxu_flops,
                sol_s=sol, bound=bound, note=note)


def build_stages(args):
    H, W = args.H, args.W
    tiles = -(-H // args.tile_h) * -(-W // args.tile_w)
    K = args.tile_capacity
    V = args.visible                 # gaussians surviving cull+compact
    E = args.instances               # emitted (tile, gaussian) instances
    C = args.anchors                 # anchor rows decoded (capacity-padded)
    k = args.n_offsets
    F = args.packed_floats           # packed splat row width
    fd, hid = args.feat_dim, args.mlp_hidden
    npix = args.tile_h * args.tile_w

    st = []

    # MLP decode: fused 2-GEMM heads over C anchors (bf16-eligible MXU work)
    d_in = fd + 3 + 1
    outs = k * (1 + 1 + 1 + 7)       # opacity, intensity, raydrop, scale+rot
    gemm_flops = 2.0 * C * (d_in * (4 * hid) + hid * outs)
    decode_bytes = C * (fd + outs + 4 * hid) * 4.0
    st.append(stage("mlp decode (4 heads, 2 GEMMs)", decode_bytes,
                    vpu_ops=C * k * 60.0, mxu_flops=gemm_flops,
                    note=f"C={C} k={k}"))

    # projection/preprocess: C*k rows -> packed [V, F]
    st.append(stage("projection + pack", (C * k * 16 + C * k * F) * 4.0,
                    vpu_ops=C * k * 160.0))

    # cull sort: C*k fused int32 keys, one-pass data touch
    st.append(stage("cull+compact sort (C*k keys)", 2 * (C * k) * 8.0,
                    note="one-pass touch; XLA sort is multi-pass"))

    # gather compacted rows [V, F]
    st.append(stage("visible compaction gather", 2 * V * F * 4.0))

    # binning: instance keys (rank-search emission: E keys) + sort
    st.append(stage("instance emission + bin sort (E keys)",
                    2 * E * 8.0 + E * 8.0,
                    note=f"E={E} ({E / max(V,1):.1f}/gaussian); one-pass"))

    # instance gather -> [T, K, F] (materialized path only)
    mat_bytes = tiles * K * F * 4.0 + E * F * 4.0
    st.append(stage("instance gather [T,K,F] (materialized)", mat_bytes,
                    note="fused_gather skips this write"))

    # composite: every kept instance against npix lanes, ~40 f32 ops each
    kept = min(E, tiles * K)
    st.append(stage("pallas composite",
                    tiles * K * F * 4.0 + tiles * 8 * npix * 4.0,
                    vpu_ops=kept * npix * 40.0,
                    note=f"kept={kept}, no early-exit credit"))

    return st, tiles


def bench_stages(visible=131072, instances=None, tile_h=1,
                 tile_capacity=384, max_tiles_per_gaussian=16,
                 max_visible=131072, H=64, W=2650):
    """Stage list at the bench workload for a LIVE raster config —
    importable so bench.py can print a per-stage measured-vs-SoL table for
    its winner (VERDICT r4 #7: the r3-era model assumed the h1 pipeline —
    dense V*16 keys, K=384 gather — and understated wide-tile SoL gaps).

    `visible` is the decoded-gaussian count surviving the cull (capped by
    max_visible: the sort front-packs valid rows and truncates). The bin
    sort handles V * max_tiles_per_gaussian static key slots; instances
    default to that static count (the emission is not compacted)."""
    V = min(visible, max_visible)
    if instances is None:
        instances = V * max_tiles_per_gaussian
    ns = argparse.Namespace(
        H=H, W=W, tile_h=tile_h, tile_w=128, tile_capacity=tile_capacity,
        anchors=65536, n_offsets=6, feat_dim=32, mlp_hidden=32,
        packed_floats=22, visible=V, instances=instances,
    )
    return build_stages(ns)[0]


def bench_sol_ms(visible=131072, instances=None, **kw) -> float:
    """Sum-of-stage SoL in ms at the bench workload — importable so
    bench.py can print measured FPS as a % of speed-of-light (VERDICT r3
    weak-#1: track the gap per round, not per memory)."""
    st = bench_stages(visible=visible, instances=instances, **kw)
    return sum(s["sol_s"] for s in st) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=64)
    ap.add_argument("--W", type=int, default=2650)
    ap.add_argument("--tile_h", type=int, default=1)
    ap.add_argument("--tile_w", type=int, default=128)
    ap.add_argument("--tile_capacity", type=int, default=384)
    ap.add_argument("--anchors", type=int, default=65536)
    ap.add_argument("--n_offsets", type=int, default=6)
    ap.add_argument("--feat_dim", type=int, default=32)
    ap.add_argument("--mlp_hidden", type=int, default=32)
    ap.add_argument("--packed_floats", type=int, default=22)
    ap.add_argument("--visible", type=int, default=131072)
    ap.add_argument("--instances", type=int, default=1_350_000)
    ap.add_argument("--stage-split", default=None,
                    help="json {stage_name: ms} from tools/stage_split.py")
    args = ap.parse_args()

    st, tiles = build_stages(args)
    measured = {}
    if args.stage_split:
        with open(args.stage_split) as f:
            measured = json.load(f)

    total = sum(s["sol_s"] for s in st)
    print(f"# bench scale: {args.H}x{args.W}, {tiles} tiles, "
          f"K={args.tile_capacity}, V={args.visible}, E={args.instances}")
    print(f"{'stage':42s} {'SoL':>12s} {'bound':>5s}  "
          f"{'measured':>10s} {'x SoL':>7s}  note")
    for s in st:
        m = None
        for key, ms in measured.items():
            if key.lower() in s["name"].lower() or \
               s["name"].lower().startswith(key.lower()):
                m = ms / 1e3
        mtxt = f"{m * 1e3:8.2f} ms" if m else " " * 10
        xtxt = f"{m / s['sol_s']:6.1f}x" if m else " " * 7
        print(f"{s['name']:42s} {fmt_us(s['sol_s'])} {s['bound']:>5s}  "
              f"{mtxt} {xtxt}  {s['note']}")
    print(f"{'TOTAL (sum of stage SoLs)':42s} {fmt_us(total)}")


if __name__ == "__main__":
    main()
