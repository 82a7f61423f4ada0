"""Distributed layer tests on the virtual 8-device CPU mesh."""
import pytest

pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp
import numpy as np

from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig
from lidargs_tpu.lidar.frames import LidarFrame, stack_frames
from lidargs_tpu.models.field import init_field_from_points
from lidargs_tpu.parallel.mesh import make_mesh
from lidargs_tpu.parallel.shard import make_dp_trainer
from lidargs_tpu.train.trainer import Trainer, init_train_state
from lidargs_tpu.ops import render_tiled
from lidargs_tpu.utils.testing import make_scene, scene_splats
from lidargs_tpu.lidar.pano import pano_to_lidar

MCFG = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8, anchor_capacity=256)
RCFG = RasterConfig(max_visible=512, max_tiles_per_gaussian=16, tile_capacity=64, chunk=8)
H, W = 8, 256


def _frame(key):
    sc = make_scene(key, n=100, H=H, W=W, r_min=5.0, r_max=40.0, scale_px=3.0)
    out = jax.jit(
        lambda: render_tiled(scene_splats(sc, RCFG), sc.beams, sc.W, jnp.zeros((2,)), RCFG)
    )()
    raydrop = (out.occ > 0.5).astype(jnp.float32)
    gt = jnp.stack([raydrop, out.color[0], out.depth], 0)
    return (
        LidarFrame(sc.w2s_rot, sc.w2s_trans, jnp.zeros(3), sc.beams, gt,
                   jnp.zeros((), jnp.int32)),
        sc,
    )


def _field(key, frame):
    pts = pano_to_lidar(np.asarray(frame.gt_image[2]),
                        beam_inclinations=np.asarray(frame.beams))
    return init_field_from_points(key, MCFG, pts, voxel_size=4.0)


def test_dp_step_matches_single_device_step():
    """B identical frames under DP must produce the same params as one
    single-frame step (mean of identical grads)."""
    frame, _ = _frame(jax.random.key(0))
    field = _field(jax.random.key(1), frame)
    ocfg = OptConfig(start_stat=0)

    trainer = Trainer(mcfg=MCFG, ocfg=ocfg, rcfg=RCFG, bg=jnp.zeros((2,)))
    s_single = init_train_state(field, MCFG)
    s_single, m_single = trainer.step(s_single, frame, 1)

    mesh = make_mesh(data=8, tile=1)
    dp_step = make_dp_trainer(mesh, MCFG, RCFG, ocfg, bg=jnp.zeros((2,)))
    # fresh field: the single step donated (deleted) the first one's buffers
    field2 = _field(jax.random.key(1), frame)
    s_dp = init_train_state(field2, MCFG)
    batch = stack_frames([frame] * 8)
    s_dp, m_dp = dp_step(s_dp, batch)

    for k in ("anchor", "offset", "feat", "scaling"):
        np.testing.assert_allclose(
            np.asarray(s_dp.params[k]), np.asarray(s_single.params[k]),
            atol=1e-5, rtol=1e-4,
        )
    # stats counted once per frame in the batch
    np.testing.assert_allclose(
        np.asarray(s_dp.anchor_demon), 8 * np.asarray(s_single.anchor_demon)
    )
    np.testing.assert_allclose(
        np.asarray(s_dp.offset_grad_accum),
        8 * np.asarray(s_single.offset_grad_accum),
        atol=1e-4, rtol=1e-3,
    )
    assert np.isclose(float(m_dp.loss.total), float(m_single.loss.total), rtol=1e-5)


def test_dp_step_distinct_frames_trains():
    frames = [_frame(jax.random.key(i))[0] for i in range(4)]
    field = _field(jax.random.key(9), frames[0])
    ocfg = OptConfig(start_stat=0)
    mesh = make_mesh(data=4, tile=2)
    dp_step = make_dp_trainer(mesh, MCFG, RCFG, ocfg, bg=jnp.zeros((2,)))
    state = init_train_state(field, MCFG)
    batch = stack_frames(frames)
    losses = []
    for _ in range(20):
        state, m = dp_step(state, batch)
        losses.append(float(m.loss.total))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_tile_sharded_render_matches_unsharded():
    sc = make_scene(jax.random.key(5), n=150, H=H, W=W)
    mesh = make_mesh(data=1, tile=8)
    bg = jnp.zeros((2,), jnp.float32)

    plain = jax.jit(
        lambda: render_tiled(scene_splats(sc, RCFG), sc.beams, sc.W, bg, RCFG)
    )()
    with jax.set_mesh(mesh):
        sharded = jax.jit(
            lambda: render_tiled(
                scene_splats(sc, RCFG), sc.beams, sc.W, bg, RCFG, tile_spec="tile"
            )
        )()
    np.testing.assert_allclose(
        np.asarray(sharded.color), np.asarray(plain.color), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded.depth), np.asarray(plain.depth), atol=1e-4
    )


def test_sharded_render_matches_single_device():
    """Gaussian+tile sharded shard_map render == single-device render_field."""
    import numpy as _np
    import jax.random as jr
    from lidargs_tpu.config import ModelConfig, RasterConfig
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations
    from lidargs_tpu.lidar.frames import LidarFrame
    from lidargs_tpu.models.field import init_field_from_points, render_field
    from lidargs_tpu.parallel.mesh import make_mesh
    from lidargs_tpu.parallel.sharded_render import render_field_sharded

    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest must set xla_force_host_platform_device_count=8"

    H, W = 16, 256
    mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8, anchor_capacity=1024)
    rcfg = RasterConfig(max_visible=2048, max_tiles_per_gaussian=16,
                        tile_capacity=64, chunk=8)
    rng = _np.random.default_rng(0)
    az = rng.uniform(-_np.pi, _np.pi, 900)
    el = rng.uniform(-0.3, 0.1, 900)
    r = rng.uniform(5.0, 50.0, 900)
    pts = _np.stack([r * _np.cos(el) * _np.cos(az),
                     r * _np.cos(el) * _np.sin(az), r * _np.sin(el)], -1)
    beams = uniform_beam_inclinations(6.0, 24.0, H)
    gt = _np.zeros((3, H, W), _np.float32)
    frame = LidarFrame.from_lidar2world(_np.eye(4), beams, gt, uid=0)
    field = init_field_from_points(jr.key(0), mcfg, pts, voxel_size=2.0)
    bg = jnp.asarray([0.1, 0.9], jnp.float32)

    ref, _, _ = jax.jit(
        lambda p, v, f: render_field(p, v, f, mcfg, rcfg, bg)
    )(field.params, field.valid, frame)

    mesh = make_mesh(data=1, tile=8)
    shr = jax.jit(
        lambda p, v, f: render_field_sharded(p, v, f, mcfg, rcfg, bg, mesh)
    )(field.params, field.valid, frame)

    np.testing.assert_allclose(np.asarray(shr.color), np.asarray(ref.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(shr.depth), np.asarray(ref.depth),
                               atol=1e-4)
    assert float(shr.occ.max()) > 0.3

    # gradients flow through the all-gather (reduce-scatter transpose)
    def loss(p):
        o = render_field_sharded(p, field.valid, frame, mcfg, rcfg, bg, mesh)
        return jnp.mean(o.color ** 2) + 0.01 * jnp.mean(o.depth)

    def loss_ref(p):
        o, _, _ = render_field(p, field.valid, frame, mcfg, rcfg, bg)
        return jnp.mean(o.color ** 2) + 0.01 * jnp.mean(o.depth)

    g_s = jax.jit(jax.grad(loss))(field.params)
    g_r = jax.jit(jax.grad(loss_ref))(field.params)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=2e-3)


def test_dp_scaling_harness_runs():
    """Scaling harness executes on the virtual CPU mesh and reports sane
    records (CPU 'efficiency' is meaningless; this checks the harness)."""
    from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig
    from lidargs_tpu.parallel.scaling import measure_dp_scaling

    mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8,
                       anchor_capacity=512)
    rcfg = RasterConfig(max_visible=1024, max_tiles_per_gaussian=8,
                        tile_capacity=32, chunk=8)
    recs = measure_dp_scaling(mcfg, RasterConfig(max_visible=1024,
                                                 max_tiles_per_gaussian=8,
                                                 tile_capacity=32, chunk=8),
                              OptConfig(start_stat=10**9),
                              H=8, W=256, n_points=1500, voxel_size=12.0,
                              device_counts=[1, 2], steps=3, warmup=1)
    assert [r["devices"] for r in recs] == [1, 2]
    for r in recs:
        assert r["rays_per_s"] > 0 and np.isfinite(r["efficiency"])
    assert recs[0]["efficiency"] == 1.0


def test_dp_densify_interleave_matches_single_device():
    """VERDICT r1 item 6 (SURVEY §7 hard part: gradient-driven
    densification across shards): an interleaved train/densify schedule on
    the 8-device mesh grows/prunes exactly the anchors a 1-device run of
    the same global batch does."""
    from lidargs_tpu.models.densify import densify_step

    frames = [_frame(jax.random.key(i))[0] for i in range(4)]
    ocfg = OptConfig(start_stat=0, update_from=0, update_interval=2,
                     densify_grad_threshold=1e-7)

    def run(n_dev):
        mesh = make_mesh(data=n_dev, tile=1)
        step = make_dp_trainer(mesh, MCFG, RCFG, ocfg, bg=jnp.zeros((2,)))
        state = init_train_state(_field(jax.random.key(9), frames[0]), MCFG)
        grown = pruned = 0
        for t in range(6):
            batch = stack_frames([frames[(t + i) % 4] for i in range(8)])
            state, _ = step(state, batch)
            if (t + 1) % 2 == 0:
                state, ds = densify_step(
                    state, jax.random.key(t), MCFG, ocfg, 4.0,
                    check_interval=2,
                )
                grown += int(ds.n_grown)
                pruned += int(ds.n_pruned)
        return state, grown, pruned

    s8, g8, p8 = run(8)
    s1, g1, p1 = run(1)
    assert (g8, p8) == (g1, p1)
    assert g8 + p8 > 0, "schedule never densified — test is vacuous"
    np.testing.assert_array_equal(np.asarray(s8.valid), np.asarray(s1.valid))
    for k in ("anchor", "offset", "feat", "scaling"):
        np.testing.assert_allclose(
            np.asarray(s8.params[k]), np.asarray(s1.params[k]),
            atol=2e-5, rtol=1e-4,
        )
