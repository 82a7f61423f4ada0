"""Surfel (2DGS) training path: step runs, loss decreases, regularizers
gate on schedule. Net-new vs the reference (its surfel training glue was
never released, readme.md:42)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig, replace
from lidargs_tpu.lidar.beams import uniform_beam_inclinations
from lidargs_tpu.lidar.frames import LidarFrame
from lidargs_tpu.models.field import init_field_from_points
from lidargs_tpu.train.losses import depth_normals
from lidargs_tpu.train.trainer import init_train_state, train_step


def _setup(H=16, W=256, n=400):
    rng = np.random.default_rng(5)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.radians(-15.0), np.radians(5.0), n)
    r = rng.uniform(5.0, 40.0, n)
    pts = np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)], -1
    )
    beams = uniform_beam_inclinations(5.0, 20.0, H)
    gt = np.zeros((3, H, W), np.float32)
    gt[0] = 1.0
    gt[1] = rng.uniform(0.2, 0.8, (H, W))
    gt[2] = rng.uniform(6.0, 35.0, (H, W))
    frame = LidarFrame.from_lidar2world(np.eye(4), beams, gt, uid=0)
    mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8, anchor_capacity=1024)
    rcfg = RasterConfig(max_visible=2048, max_tiles_per_gaussian=8,
                        tile_capacity=64, chunk=8)
    field = init_field_from_points(jax.random.key(0), mcfg, pts, voxel_size=1.5)
    return field, frame, mcfg, rcfg


def test_surfel_train_step_decreases_loss():
    field, frame, mcfg, rcfg = _setup()
    ocfg = replace(OptConfig(), dist_from=0, normal_from=0)
    state = init_train_state(field, mcfg)
    step = jax.jit(functools.partial(
        train_step, bg=jnp.zeros((2,), jnp.float32),
        mcfg=mcfg, rcfg=rcfg, ocfg=ocfg, variant="surfel",
    ))
    losses = []
    for _ in range(12):
        state, m = step(state, frame)
        losses.append(float(m.loss.total))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # densification statistics accumulated through the surfel mean proxy
    assert float(jnp.sum(state.offset_grad_accum)) > 0.0


@pytest.mark.heavy  # long gated-training run (65s)
def test_surfel_regularizers_gate_on_schedule():
    field, frame, mcfg, rcfg = _setup()
    state = init_train_state(field, mcfg)
    kw = dict(bg=jnp.zeros((2,), jnp.float32), mcfg=mcfg, rcfg=rcfg)
    # gated off (step 0 < dist_from): totals must match a zero-weight run
    o_gated = replace(OptConfig(), dist_from=10**6, normal_from=10**6)
    o_zero = replace(OptConfig(), dist_from=0, normal_from=0,
                     dist_lambda=0.0, normal_lambda=0.0)
    _, m1 = jax.jit(functools.partial(train_step, ocfg=o_gated, variant="surfel", **kw))(state, frame)
    _, m2 = jax.jit(functools.partial(train_step, ocfg=o_zero, variant="surfel", **kw))(state, frame)
    np.testing.assert_allclose(float(m1.loss.total), float(m2.loss.total), rtol=1e-6)
    # active regularizers change the total
    o_on = replace(OptConfig(), dist_from=0, normal_from=0)
    _, m3 = jax.jit(functools.partial(train_step, ocfg=o_on, variant="surfel", **kw))(state, frame)
    assert abs(float(m3.loss.total) - float(m2.loss.total)) > 0.0


def test_depth_normals_flat_ground():
    """Back-projected normals of a flat z=-h plane must point up (+z)."""
    H, W = 24, 128
    beams = uniform_beam_inclinations(10.0, 30.0, H)
    rows = np.arange(H)
    # depth of the plane z=-2 seen from origin: d = 2 / sin(|alpha|)
    alp = np.asarray(beams)[H - 1 - rows]
    d = 2.0 / np.maximum(np.sin(-alp), 1e-3)
    depth = jnp.asarray(np.repeat(d[:, None], W, 1).astype(np.float32))
    n = np.asarray(depth_normals(depth, jnp.asarray(beams), W))
    down = alp < -0.05  # rows whose beams actually hit the plane
    up = np.abs(n[2][down][1:-1, 2:-2])  # crop finite-difference borders
    assert (up > 0.95).mean() > 0.9
