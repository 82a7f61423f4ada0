"""Waymo-scale surfel vs beam train-step timing on the real TPU
(PYTHONPATH=. python tools/bench_train_step.py [substr ...]).
Positional args filter the variant list by substring match, so a tunnel
window can time just the configs under test.
Round-1 baseline: beam 42 ms, surfel 101 ms (XLA autodiff backward);
round-2 adds the hand surfel backward and the fused-gather variants."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp

from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig
from lidargs_tpu.lidar.beams import uniform_beam_inclinations
from lidargs_tpu.lidar.frames import LidarFrame
from lidargs_tpu.models.field import init_field_params
from lidargs_tpu.train.trainer import init_train_state, train_step


class FieldLike:
    pass


def main():
    H, W = 64, 2650
    N_ANCHORS = 60_000
    mcfg = ModelConfig(anchor_capacity=65_536)
    rcfg = RasterConfig(
        max_visible=2 ** 17, max_tiles_per_gaussian=16, tile_capacity=384,
        chunk=16,
    )
    rng = np.random.default_rng(0)
    az = rng.uniform(-np.pi, np.pi, N_ANCHORS)
    el = rng.uniform(np.radians(-20.0), np.radians(2.0), N_ANCHORS)
    r = rng.uniform(4.0, 75.0, N_ANCHORS)
    pts = np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)],
        -1,
    ).astype(np.float32)

    params = init_field_params(jax.random.key(0), mcfg)
    params["anchor"] = params["anchor"].at[:N_ANCHORS].set(jnp.asarray(pts))
    scale = np.log(np.clip(r * 0.004, 0.02, 0.5)).astype(np.float32)
    params["scaling"] = params["scaling"].at[:N_ANCHORS].set(
        jnp.asarray(np.repeat(scale[:, None], 6, axis=1))
    )
    params["feat"] = params["feat"].at[:N_ANCHORS].set(
        jax.random.normal(jax.random.key(1), (N_ANCHORS, mcfg.feat_dim)) * 0.3
    )
    valid = jnp.arange(mcfg.anchor_capacity) < N_ANCHORS

    beams = uniform_beam_inclinations(2.4, 20.9, H)
    gt = np.zeros((3, H, W), np.float32)
    gt[0] = (rng.uniform(size=(H, W)) > 0.2).astype(np.float32)
    gt[1] = rng.uniform(size=(H, W)).astype(np.float32) * gt[0]
    gt[2] = rng.uniform(5.0, 70.0, size=(H, W)).astype(np.float32) * gt[0]
    frame = LidarFrame.from_lidar2world(np.eye(4), beams, gt, uid=0)
    bg = jnp.zeros((2,), jnp.float32)
    ocfg = OptConfig(start_stat=10 ** 9)

    # Host snapshot: train_step donates the state, so the device arrays in
    # `params` are consumed by the first variant's first step — each variant
    # must re-init from host copies, not from the deleted device buffers.
    params_host = jax.device_get(params)
    valid_host = jax.device_get(valid)
    field = FieldLike()

    from lidargs_tpu.config import replace as _replace

    rcfg_fused = _replace(rcfg, fused_gather=True)
    # r4 render-sweep frontier (tools/bench_render_ab.py on v5e): the
    # fastest base-quality config and the balanced 3x-lower-error config
    rcfg_h4f = _replace(rcfg, tile_h=4, tile_capacity=512,
                        max_tiles_per_gaussian=4)
    rcfg_h4q = _replace(rcfg, tile_h=4, tile_capacity=768,
                        max_tiles_per_gaussian=8)
    variants = (("beam", rcfg), ("surfel", rcfg),
                ("beam+fused", rcfg_fused),
                ("surfel+fused", rcfg_fused),
                ("beam h4/K512/cap4", rcfg_h4f),
                ("beam h4/K768/cap8", rcfg_h4q),
                ("surfel h4/K768/cap8", rcfg_h4q),
                ("surfel h4/K512/cap4", rcfg_h4f),
                ("beam h4/K768/cap8+rematproj",
                 _replace(rcfg_h4q, remat_projection=True)),
                ("beam h4/K512/cap4+rematproj",
                 _replace(rcfg_h4f, remat_projection=True)),
                ("surfel+rematproj",
                 _replace(rcfg, remat_projection=True)),
                ("surfel h4/K512/cap4+rematproj",
                 _replace(rcfg_h4f, remat_projection=True)))
    picks = sys.argv[1:]
    if picks:
        # "=name" is an exact match, anything else a substring match
        hit = lambda v: any(p[1:] == v if p.startswith("=") else p in v
                            for p in picks)
        variants = [(v, vr) for v, vr in variants if hit(v)]
        if not variants:
            raise SystemExit(f"no variants match filters {picks!r} — "
                             "nothing benchmarked")
        print("# selected:", ", ".join(v for v, _ in variants), flush=True)
    for variant, vr in variants:
        base_variant = "surfel" if variant.startswith("surfel") else "beam"
        # re-materialize from host copies: donate_argnums consumes the
        # previous variant's device buffers (incl. valid inside the state)
        field.params = jax.tree.map(jnp.asarray, params_host)
        field.valid = jnp.asarray(valid_host)
        state = init_train_state(field, mcfg)
        step = jax.jit(functools.partial(
            train_step, bg=bg, mcfg=mcfg, rcfg=vr, ocfg=ocfg,
            variant=base_variant
        ), donate_argnums=(0,))
        t0 = time.perf_counter()
        state, m = step(state, frame)
        jax.block_until_ready(state.params["anchor"])
        print(f"{variant}: compile+1 {time.perf_counter()-t0:.1f}s "
              f"loss={float(m.loss.total):.4f}")
        for _ in range(3):
            state, m = step(state, frame)
        jax.block_until_ready(state.params["anchor"])
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, frame)
        jax.block_until_ready(state.params["anchor"])
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{variant}: {dt:.1f} ms/step  loss={float(m.loss.total):.4f}")


main()
