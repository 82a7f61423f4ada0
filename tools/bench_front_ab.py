"""Front-section (prefilter + MLP decode + projection) decomposition and
A/B on the real chip, on the trustworthy fetch-synced scan-replication
protocol (tools/chiptime.py — block_until_ready is a NO-OP for non-pallas
programs on the axon backend, so naive timing loops measure enqueue).

The r5 prefix split shows the frame is front-section bound (VERDICT r4 #1):
prefilter+decode+project = ~4 ms of the 10 ms h4/K512/cap4 frame, vs a
~0.2 ms HBM roofline. Cumulative sub-prefixes inside the decode find the
pathological fusion; variants A/B candidate fixes.

    PYTHONPATH=. python tools/bench_front_ab.py [--k 16] [--rows pre,cat,...]
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--anchors", type=int, default=60_000)
    ap.add_argument("--anchor_capacity", type=int, default=65_536)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--rows", default=None,
                    help="comma-separated row names to run (default: all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from chiptime import measure_scan, null_latency

    from lidargs_tpu.config import ModelConfig, RasterConfig
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations
    from lidargs_tpu.lidar.frames import LidarFrame
    from lidargs_tpu.models.field import (
        generate_neural_gaussians, init_field_params, prefilter_anchors,
    )
    from lidargs_tpu.ops.projection import pack_splats, preprocess_gaussians

    H, W = 64, 2650
    N = args.anchors
    mcfg = ModelConfig(anchor_capacity=args.anchor_capacity)
    rcfg = RasterConfig(max_visible=2 ** 17, tile_h=4, tile_capacity=512,
                        max_tiles_per_gaussian=4, chunk=16)
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

    k_off = mcfg.n_offsets
    Cap = mcfg.anchor_capacity

    def perturbed(p, c):
        q = dict(p)
        q["anchor"] = p["anchor"] + c * 1e-30
        return q

    def s(*xs):
        return sum(jnp.sum(x) for x in xs) * 1e-30

    # ---- cumulative prefixes (each: fn(carry, params, valid, frame)) ----
    def pre(c, p, v, f):
        return s(prefilter_anchors(perturbed(p, c), v, f, rcfg))

    def _cat(p, f):
        anchor = p["anchor"]
        ob = anchor - f.center
        d2 = jnp.sum(ob * ob, axis=1, keepdims=True)
        ok = d2 > 0.0
        ob_dist = jnp.sqrt(jnp.where(ok, d2, 1.0))
        ob = jnp.where(ok, ob, 0.0) / ob_dist
        return jnp.concatenate([p["feat"], ob, ob_dist], 1)

    def cat(c, p, v, f):
        p = perturbed(p, c)
        av = prefilter_anchors(p, v, f, rcfg)
        return s(_cat(p, f), av)

    def _h(p, f):
        x = _cat(p, f)
        names = ("mlp_opacity", "mlp_color", "mlp_raydrop", "mlp_cov")
        w1 = jnp.concatenate([p[n]["l1"]["w"] for n in names], axis=1)
        b1 = jnp.concatenate([p[n]["l1"]["b"] for n in names])
        return jax.nn.relu(x @ w1 + b1)

    def gemm1(c, p, v, f):
        p = perturbed(p, c)
        av = prefilter_anchors(p, v, f, rcfg)
        return s(_h(p, f), av)

    def _outs(p, f):
        h = _h(p, f)
        names = ("mlp_opacity", "mlp_color", "mlp_raydrop", "mlp_cov")
        Hd = p["mlp_opacity"]["l1"]["w"].shape[1]
        return [h[:, i * Hd:(i + 1) * Hd] @ p[nm]["l2"]["w"] + p[nm]["l2"]["b"]
                for i, nm in enumerate(names)]

    def gemm2(c, p, v, f):
        p = perturbed(p, c)
        av = prefilter_anchors(p, v, f, rcfg)
        return s(*_outs(p, f), av)

    def act(c, p, v, f):
        p = perturbed(p, c)
        av = prefilter_anchors(p, v, f, rcfg)
        outs = _outs(p, f)
        neural_op = jnp.tanh(outs[0]).reshape(-1)
        intensity = jax.nn.sigmoid(outs[1]).reshape(Cap * k_off, 1)
        raydrop = jax.nn.sigmoid(outs[2]).reshape(Cap * k_off, 1)
        scale_rot = outs[3].reshape(Cap * k_off, 7)
        return s(neural_op, intensity, raydrop, scale_rot, av)

    def _ng(p, v, f):
        av = prefilter_anchors(p, v, f, rcfg)
        return generate_neural_gaussians(p, v, av, f.center, mcfg,
                                         cam_uid=f.uid), av

    def decode(c, p, v, f):
        ng, av = _ng(perturbed(p, c), v, f)
        return s(ng.xyz, ng.feat, ng.opacity, ng.scaling, ng.rot, av)

    def project(c, p, v, f):
        ng, av = _ng(perturbed(p, c), v, f)
        fl = lambda x: x.reshape((-1,) + x.shape[2:])
        pk = pack_splats(preprocess_gaussians(
            fl(ng.xyz), fl(ng.scaling), fl(ng.rot),
            fl(ng.opacity), fl(ng.feat), fl(ng.mask),
            f.w2s_rot, f.w2s_trans, f.beams, f.W, rcfg))
        return s(pk)

    rows = [
        ("pre", "prefilter", pre),
        ("cat", "+obview/cat", cat),
        ("gemm1", "+gemm1 (h)", gemm1),
        ("gemm2", "+gemm2 (outs)", gemm2),
        ("act", "+activations", act),
        ("decode", "+full decode", decode),
        ("project", "+projection+pack", project),
    ]
    want = set(args.rows.split(",")) if args.rows else None

    L = null_latency()
    print(f"# null latency {L:.2f} ms, k={args.k}", flush=True)
    prev = 0.0
    for key, name, fn in rows:
        if want is not None and key not in want:
            continue
        ms, d = measure_scan(lambda fn=fn: (fn, (params, valid, frame)),
                             k=args.k)
        print(f"{name:22s}: {ms:7.3f} ms  (+{ms - prev:6.3f})   "
              f"[t_k={d['t_k']:.1f} t_1={d['t_k0']:.1f}]", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
