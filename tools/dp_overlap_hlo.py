"""DP gradient-psum overlap: evidence from the scheduled HLO (VERDICT r4 #6).

DESIGN §8's N-chip projection assumes XLA overlaps the ~33.5 MB gradient
all-reduce with backward compute. This tool turns that assumption into an
artifact: compile the data-parallel train step on an 8-device mesh, dump
the optimized (scheduled) HLO, and check the collective is emitted as an
async start/done pair with real compute scheduled between start and done.

Run on the virtual-CPU fleet (the sharding/scheduling pipeline is the same
XLA SPMD partitioner used on TPU; only the collective *implementation*
differs):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        PYTHONPATH=. python tools/dp_overlap_hlo.py

Writes benchmarks/dp_overlap_hlo_r5.json with the counts + an excerpt.
"""
from __future__ import annotations

import json
import os
import re
import sys


def main() -> None:
    tpu_aot = "--tpu" in sys.argv
    big = "--big" in sys.argv
    if not tpu_aot:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
    import jax

    if not tpu_aot:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        n = len(jax.devices())
        assert n >= 8, f"need 8 virtual devices, have {n}"

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_setup

    from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig
    from lidargs_tpu.lidar.frames import stack_frames
    from lidargs_tpu.parallel.shard import make_dp_trainer
    from lidargs_tpu.train.trainer import init_train_state

    if big:
        # bench-ish scale: the 33.5 MB grad payload DESIGN §8 reasons about
        mcfg = ModelConfig(anchor_capacity=131072)
        rcfg = RasterConfig(max_visible=2 ** 17, tile_h=4,
                            tile_capacity=768, max_tiles_per_gaussian=8,
                            chunk=16)
        H, W, n_pts, vox = 64, 2650, 60_000, 0.35
    else:
        mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8,
                           anchor_capacity=512)
        rcfg = RasterConfig(max_visible=512, max_tiles_per_gaussian=8,
                            tile_capacity=32, chunk=8)
        H, W, n_pts, vox = 8, 256, 1_500, 8.0
    field, frame = _tiny_setup(mcfg, rcfg, H=H, W=W, n_points=n_pts,
                               voxel_size=vox)
    bg = jnp.zeros((2,), jnp.float32)

    import numpy as _np

    if tpu_aot:
        # compile for a REAL 8-chip v5e slice via the AOT topology API —
        # the scheduled module shows the actual TPU collective scheduling
        # (the CPU backend only emits synchronous all-reduce)
        from jax.experimental import topologies
        from jax.sharding import Mesh

        topo = topologies.get_topology_desc(topology_name="v5e:2x4",
                                            platform="tpu")
        mesh = Mesh(_np.array(topo.devices).reshape(8, 1), ("data", "tile"))
        backend_label = "tpu-aot v5e:2x4"
    else:
        from lidargs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=8, tile=1)
        backend_label = f"cpu virtual x{len(jax.devices())}"
    dp_step = make_dp_trainer(mesh, mcfg, rcfg, OptConfig(start_stat=0),
                              bg=bg)
    state = init_train_state(field, mcfg)
    frames = stack_frames([frame] * 8)
    if tpu_aot:
        # inputs live on the axon device / host — lower from abstract shapes
        state, frames = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            (state, frames))

    lowered = dp_step.lower(state, frames)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # async collectives appear as <op>-start/<op>-done pairs in the
    # scheduled module; count them and measure how much real compute the
    # scheduler placed inside each start..done window
    starts = re.findall(r"\b(all-reduce|reduce-scatter|all-gather)-start\b",
                        hlo)
    dones = re.findall(r"\b(all-reduce|reduce-scatter|all-gather)-done\b",
                       hlo)
    # tuple-typed collectives: `%all-reduce.31 = (f32[...], ...) all-reduce(`
    sync = [m for m in re.findall(r" (all-reduce|reduce-scatter|all-gather)"
                                  r"(?:\.\d+)?\(", hlo)
            ] if not starts else []

    # overlap evidence: in the scheduled instruction stream, count
    # non-trivial ops (dot/convolution/fusion/sort/gather/scatter) between
    # each start and its done
    lines = hlo.splitlines()
    windows = []
    open_at = {}
    compute_re = re.compile(
        r"\b(dot|fusion|sort|gather|scatter|convolution|custom-call)\b")
    for i, line in enumerate(lines):
        m = re.search(r"(\S+) = \S+ (all-reduce|reduce-scatter|all-gather)"
                      r"-start\(", line)
        if m:
            open_at[m.group(1)] = [i, 0]
        for name, rec in list(open_at.items()):
            if f"-done({name}" in line or f"-done(%{name}" in line:
                windows.append({"collective": name,
                                "compute_ops_inside": rec[1],
                                "window_lines": i - rec[0]})
                del open_at[name]
            elif compute_re.search(line) and "-start(" not in line:
                rec[1] += 1

    overlapped = [w for w in windows if w["compute_ops_inside"] > 0]
    result = {
        "backend": backend_label,
        "async_starts": len(starts),
        "async_dones": len(dones),
        "sync_all_reduces": len(sync),
        "windows": windows[:32],
        "n_windows_with_compute_inside": len(overlapped),
        "conclusion": (
            "async collectives with compute scheduled inside start..done "
            "windows — the DP grad reduce is overlap-eligible as assumed"
            if overlapped else
            ("async start/done pairs present but no compute scheduled "
             "inside — overlap not demonstrated on this backend"
             if windows else
             "no async collective pairs found — collectives are synchronous "
             "in this module")),
    }
    os.makedirs("benchmarks", exist_ok=True)
    suffix = "_tpu" if tpu_aot else "_cpu"
    suffix += "_big" if big else ""
    out = f"benchmarks/dp_overlap_hlo_r5{suffix}.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "windows"},
                     indent=2))
    # excerpt for the artifact: first start line + its done line
    for w in windows[:3]:
        print("window:", w)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
