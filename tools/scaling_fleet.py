"""Multi-host rays/s scaling harness (north star: >=80% at N>=2 hosts).

Launches localhost fleets of 1..N `jax.distributed`-coordinated
processes (each owning `--local_devices` virtual CPU devices — or, on a
real pod, its local TPU chips) and measures DP train-step throughput on
the global mesh of each fleet. Efficiency is rays/s vs linear scaling of
the 1-host fleet. The reference has no distributed mode (SURVEY.md
§2.3); these numbers are net-new capability.

Usage (launcher):  python tools/scaling_fleet.py --hosts 1 2 --local_devices 4
Worker mode (internal): python tools/scaling_fleet.py --worker '<json>'
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker(cfg: dict) -> None:
    from lidargs_tpu.parallel.runtime import RuntimeConfig, init_runtime

    rt = init_runtime(RuntimeConfig(
        coordinator_address=cfg["coord"],
        num_processes=cfg["nproc"],
        process_id=cfg["pid"],
        platform=cfg.get("platform", "cpu"),
        local_device_count=cfg.get("local_devices"),
    ))

    from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig
    from lidargs_tpu.parallel.scaling import measure_dp_rate

    mcfg = ModelConfig(**cfg.get("mcfg", {}))
    rcfg = RasterConfig(**cfg.get("rcfg", {}))
    ocfg = OptConfig(start_stat=10**9)  # no densify stats in the timed loop
    mesh = rt.global_mesh(data=-1)
    rec = measure_dp_rate(
        mesh, mcfg, rcfg, ocfg,
        H=cfg["H"], W=cfg["W"], n_points=cfg["n_points"],
        steps=cfg["steps"], warmup=cfg["warmup"],
        voxel_size=cfg["voxel_size"], runtime=rt,
    )
    rt.sync("scaling-done")
    if rt.is_coordinator:
        with open(cfg["out"], "w") as f:
            json.dump(rec, f)
    print(f"[p{rt.process_id}] {rec}", flush=True)


def launch_fleet(nproc: int, args, out_path: str) -> dict:
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(nproc):
        cfg = {
            "coord": f"127.0.0.1:{port}", "nproc": nproc, "pid": pid,
            "local_devices": args.local_devices,
            "H": args.H, "W": args.W, "n_points": args.n_points,
            "steps": args.steps, "warmup": args.warmup,
            "voxel_size": args.voxel_size, "out": out_path,
            "mcfg": {"feat_dim": args.feat_dim, "n_offsets": args.n_offsets,
                     "anchor_capacity": args.anchor_capacity},
            "rcfg": {"max_visible": args.max_visible},
        }
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             json.dumps(cfg)],
            env=env, cwd=REPO,
        ))
    rcs = [p.wait(timeout=args.timeout) for p in procs]
    if any(rc != 0 for rc in rcs):
        raise RuntimeError(f"fleet nproc={nproc} exited with {rcs}")
    with open(out_path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=str, default=None)
    ap.add_argument("--hosts", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--H", type=int, default=32)
    ap.add_argument("--W", type=int, default=1024)
    ap.add_argument("--n_points", type=int, default=20_000)
    ap.add_argument("--anchor_capacity", type=int, default=32768)
    ap.add_argument("--max_visible", type=int, default=32768)
    ap.add_argument("--feat_dim", type=int, default=16)
    ap.add_argument("--n_offsets", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--voxel_size", type=float, default=1.0)
    ap.add_argument("--timeout", type=int, default=1200)
    ap.add_argument("--json_out", type=str, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(json.loads(args.worker))
        return

    records = []
    base = None
    cpus = os.cpu_count() or 1
    for n in args.hosts:
        rec = launch_fleet(n, args, f"/tmp/scaling_fleet_{n}.json")
        if base is None:
            base = rec["rays_per_s"] / rec["hosts"]
        rec["efficiency"] = rec["rays_per_s"] / (base * n)
        rec["host_cpus"] = cpus
        # the localhost fleet is a MECHANICS check (coordination, mesh,
        # sharding, collectives); its efficiency number only measures
        # scaling when each process gets its own core(s)
        rec["efficiency_meaningful"] = cpus >= n * args.local_devices
        records.append(rec)
        tag = "" if rec["efficiency_meaningful"] else (
            f"  [NOT a scaling measurement: {n * args.local_devices} virtual"
            f" devices time-share {cpus} physical core(s)]")
        print(f"hosts={n} devices={rec['devices']} "
              f"{rec['rays_per_s']/1e6:.2f} Mrays/s "
              f"eff={rec['efficiency']:.2%}{tag}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
