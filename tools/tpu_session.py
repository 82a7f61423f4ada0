"""One-shot TPU session orchestrator: run everything the round owes the
chip, in priority order, the moment the tunnel is up.

The axon tunnel is EXCLUSIVE and has been down for whole rounds at a time —
when a window opens it must capture every staged measurement without a
human in the loop. Runs each step as its own subprocess (so one crash or
Mosaic failure doesn't sink the rest), serialized (exclusive tunnel), each
under a timeout, logging to <outdir>/<step>.log and writing a summary JSON.

    python tools/tpu_session.py [--outdir /tmp/tpu_session] [--quick]
    python tools/tpu_session.py --only verify,binning_ab

Priority order (VERDICT r2 #1/#3/#6):
  1. verify       — correctness incl. Mosaic compile of fused-gather +
                    surfel hand-backward (tools/verify_tpu.py)
  2. binning_ab   — instance-budget / tile_h / fused A-B (bench_binning_ab)
  3. train_step   — beam/surfel +-fused step timings (bench_train_step)
  4. stage_split  — per-stage ms for the roofline table (stage_split)
  5. bench        — the headline FPS line (bench.py)
  6. street_10k   — full-capacity street-fixture quality run (the
                    late-training-collapse regression check on chip)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tpu_up(timeout_s: float = 150.0) -> bool:
    result = {}

    def probe():
        try:
            import jax
            result["ok"] = bool(jax.devices())
        except Exception as e:  # noqa: BLE001
            result["err"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return result.get("ok", False)


STREET_SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
from lidargs_tpu.data.synthetic import make_street_dataset
from lidargs_tpu.train import cli
root = os.path.join({outdir!r}, "street_ds")
if not os.path.exists(os.path.join(root, "transforms_train.json")):
    make_street_dataset(root, n_frames=50, H=32, W=512)
cli.main([
    "-s", root, "-m", os.path.join({outdir!r}, "street_run_tpu"),
    "--iterations", "10000", "--voxel_size", "0.35",
    "--anchor_capacity", "131072", "--max_visible", "262144",
    "--depth_min", "1",
    # raster knobs: the shipped beam defaults (r4: h4/K768/cap8) — this
    # run validates the late-training clamp at full capacity on exactly
    # the config users get
    "--test_iterations", "2000", "4000", "6000", "8000", "10000",
    "--save_iterations", "10000", "--log_every", "500",
])
"""


def steps(outdir: str, quick: bool):
    py = sys.executable
    s = [
        ("verify", [py, os.path.join(REPO, "tools", "verify_tpu.py")], 1800),
        ("binning_ab", [py, os.path.join(REPO, "tools", "bench_binning_ab.py")],
         2400),
        ("train_step", [py, os.path.join(REPO, "tools", "bench_train_step.py")],
         2400),
        ("stage_split", [py, os.path.join(REPO, "tools", "stage_split.py")],
         1200),
        ("bench", [py, os.path.join(REPO, "bench.py")], 1200),
    ]
    if not quick:
        s.append(("street_10k",
                  [py, "-c", STREET_SCRIPT.format(repo=REPO, outdir=outdir)],
                  3600 * 3))
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/tpu_session")
    ap.add_argument("--quick", action="store_true",
                    help="skip the 10k street-fixture training run")
    ap.add_argument("--only", default=None,
                    help="comma-separated step names to run")
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    if not args.skip_probe:
        print("probing TPU...", flush=True)
        if not tpu_up():
            print("TPU tunnel DOWN — aborting (rc=3)", flush=True)
            raise SystemExit(3)
        print("TPU up.", flush=True)

    only = set(args.only.split(",")) if args.only else None
    summary = {}
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for name, cmd, tmo in steps(args.outdir, args.quick):
        if only is not None and name not in only:
            continue
        log_path = os.path.join(args.outdir, f"{name}.log")
        print(f"=== {name} (timeout {tmo}s) -> {log_path}", flush=True)
        t0 = time.time()
        with open(log_path, "w") as log:
            try:
                rc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                                    cwd=REPO, env=env, timeout=tmo).returncode
            except subprocess.TimeoutExpired:
                rc = -9
        dt = time.time() - t0
        summary[name] = {"rc": rc, "seconds": round(dt, 1)}
        print(f"    rc={rc} in {dt:.0f}s", flush=True)
        with open(os.path.join(args.outdir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        # tail the log so progress is visible inline
        with open(log_path) as f:
            tail = f.read()[-1500:]
        print(tail, flush=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
