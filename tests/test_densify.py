"""Densification tests: growing invariants, dedup, pruning, Adam surgery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig
from lidargs_tpu.models.densify import densify_step
from lidargs_tpu.models.field import init_field_from_points
from lidargs_tpu.train.trainer import Trainer, init_train_state

MCFG = ModelConfig(
    feat_dim=8, n_offsets=2, mlp_hidden=8, anchor_capacity=512,
    grow_src_cap=1024, grow_cap_per_level=128,
)
OCFG = OptConfig(update_interval=100, success_threshold=0.1,
                 densify_grad_threshold=5e-4, min_opacity=0.005)
VOXEL = 1.0


def _state(key=0, n_pts=200):
    rng = np.random.default_rng(key)
    pts = rng.uniform(-20, 20, (n_pts, 3))
    field = init_field_from_points(jax.random.key(key), MCFG, pts, voxel_size=VOXEL)
    return init_train_state(field, MCFG), field


def test_no_stats_no_change():
    state, _ = _state()
    before = jax.tree.map(lambda x: np.asarray(x), state.params)
    valid_before = np.asarray(state.valid)
    new, stats = densify_step(state, jax.random.key(1), MCFG, OCFG, VOXEL)
    assert int(stats.n_grown) == 0
    assert int(stats.n_pruned) == 0
    np.testing.assert_array_equal(np.asarray(new.valid), valid_before)
    np.testing.assert_allclose(np.asarray(new.params["anchor"]), before["anchor"])


def test_growing_adds_on_grid_and_dedups():
    state, field = _state()
    C = MCFG.anchor_capacity
    k = MCFG.n_offsets
    n0 = int(state.valid.sum())
    # huge gradient signal on the offsets of the first 50 anchors, with
    # offsets displaced so candidates fall off the existing anchors
    offs = state.params["offset"].at[:50].set(
        jnp.asarray(np.random.default_rng(0).uniform(3, 9, (50, k, 3)), jnp.float32)
    )
    state = state._replace(params={**state.params, "offset": offs})
    big = jnp.zeros((C * k,)).at[: 50 * k].set(1.0)
    denom = jnp.zeros((C * k,)).at[: 50 * k].set(100.0)
    state = state._replace(
        offset_grad_accum=big * denom,  # mean grad 1.0 >> threshold
        offset_denom=denom,
    )
    new, stats = densify_step(state, jax.random.key(2), MCFG, OCFG, VOXEL)
    n_grown = int(stats.n_grown)
    assert n_grown > 0
    assert int(new.valid.sum()) == n0 + n_grown

    new_rows = np.asarray(new.valid & ~state.valid)
    anchors_new = np.asarray(new.params["anchor"])[new_rows]
    # every grown anchor sits on one of the 3 level grids
    sizes = [VOXEL * 16, VOXEL * 4, VOXEL * 1]
    on_grid = np.zeros(len(anchors_new), bool)
    for s in sizes:
        on_grid |= np.all(np.abs(anchors_new - np.round(anchors_new / s) * s) < 1e-4, 1)
    assert on_grid.all()
    # no grown anchor duplicates an existing finest-grid cell
    old_cells = {tuple(c) for c in np.round(
        np.asarray(state.params["anchor"])[np.asarray(state.valid)] / VOXEL
    ).astype(int)}
    for a, fine in zip(anchors_new, np.all(
        np.abs(anchors_new - np.round(anchors_new / VOXEL) * VOXEL) < 1e-4, 1
    )):
        if fine:
            assert tuple(np.round(a / VOXEL).astype(int)) not in old_cells
    # Adam moments of grown rows are zero
    mu_new = np.asarray(new.opt.mu["anchor"])[new_rows]
    assert (mu_new == 0).all()
    # grown rows got opacity inverse_sigmoid(0.9)
    op_new = np.asarray(new.params["opacity"])[new_rows]
    np.testing.assert_allclose(op_new, np.log(0.9 / 0.1), atol=1e-5)
    # stats reset where offsets passed the success threshold
    assert float(new.offset_denom[: 50 * k].max()) == 0.0


def test_prune_removes_low_opacity_visited_anchors():
    state, _ = _state()
    n0 = int(state.valid.sum())
    # anchors 0..9: visited a lot, tiny opacity -> prune
    # anchors 10..19: visited a lot, high opacity -> keep + stats reset
    oa = state.opacity_accum.at[:10].set(0.0001).at[10:20].set(50.0)
    ad = state.anchor_demon.at[:20].set(100.0)
    state = state._replace(opacity_accum=oa, anchor_demon=ad)
    new, stats = densify_step(state, jax.random.key(3), MCFG, OCFG, VOXEL)
    assert int(stats.n_pruned) == 10
    assert int(new.valid.sum()) == n0 - 10
    assert not bool(new.valid[:10].any())
    assert bool(new.valid[10:20].all())
    # pruned rows zeroed
    assert float(jnp.abs(new.params["anchor"][:10]).max()) == 0.0
    # visited survivors got stats reset
    assert float(new.opacity_accum[10:20].max()) == 0.0
    assert float(new.anchor_demon[10:20].max()) == 0.0
    # log-scale clamp applied
    assert float(new.params["scaling"][:, 3:].max()) <= 0.05 + 1e-6


@pytest.mark.heavy  # densify convergence run (51s)
def test_end_to_end_training_with_densify():
    import jax.numpy as jnp
    from lidargs_tpu.lidar.frames import LidarFrame
    from lidargs_tpu.lidar.pano import pano_to_lidar
    from lidargs_tpu.ops import render_tiled
    from lidargs_tpu.utils.testing import make_scene, scene_splats

    RCFG = RasterConfig(max_visible=1024, max_tiles_per_gaussian=16,
                        tile_capacity=64, chunk=8)
    sc = make_scene(jax.random.key(7), n=150, H=8, W=256, r_min=5.0, r_max=40.0)
    out = jax.jit(
        lambda: render_tiled(scene_splats(sc, RCFG), sc.beams, sc.W, jnp.zeros((2,)), RCFG)
    )()
    gt = jnp.stack([(out.occ > 0.5).astype(jnp.float32), out.color[0], out.depth], 0)
    frame = LidarFrame(sc.w2s_rot, sc.w2s_trans, jnp.zeros(3), sc.beams, gt,
                       jnp.zeros((), jnp.int32))
    pts = pano_to_lidar(np.asarray(gt[2]), beam_inclinations=np.asarray(frame.beams))
    field = init_field_from_points(jax.random.key(8), MCFG, pts, voxel_size=4.0)

    ocfg = OptConfig(start_stat=2, update_from=5, update_interval=20,
                     update_until=1000, densify_grad_threshold=1e-5,
                     success_threshold=0.1)
    trainer = Trainer(mcfg=MCFG, ocfg=ocfg, rcfg=RCFG, bg=jnp.zeros((2,)))
    state = init_train_state(field, MCFG)
    n0 = int(state.valid.sum())
    losses = []
    for it in range(1, 81):
        state, m = trainer.step(state, frame, it)
        losses.append(float(m.loss.total))
        if trainer.should_densify(int(state.valid.sum()), it):
            # fine densify voxel (0.5m): decoded centers sit ~0.6m off their
            # anchors, so growth is observable within a short test run
            state, dstats = trainer.densify(state, jax.random.key(100 + it), 0.5)
    assert np.isfinite(losses).all()
    n1 = int(state.valid.sum())
    assert n1 != n0  # densification actually did something
    assert losses[-1] < losses[0]


def test_maintain_clamps_cov_scales_after_update_until():
    """Post-densify maintenance (VERDICT r2 #2): the prune-pass cov
    log-scale clamp keeps running at the update_interval cadence after
    update_until, so cov scales cannot run away once prune stops (the
    street-fixture collapse: unclamped cov scales grew ~1 m -> 29 m and
    the bloated gaussians evicted real geometry from the per-tile
    nearest-K budget)."""
    state, _ = _state(0)
    tr = Trainer(mcfg=MCFG, ocfg=OCFG, rcfg=RasterConfig(), bg=jnp.zeros((2,)))

    # cadence: off during the densify era, on at update_interval after
    assert not tr.should_maintain(OCFG.update_until - OCFG.update_interval)
    assert tr.should_maintain(OCFG.update_until + OCFG.update_interval)
    assert not tr.should_maintain(OCFG.update_until + OCFG.update_interval + 1)
    off = OptConfig(update_interval=OCFG.update_interval,
                    update_until=OCFG.update_until,
                    scale_clamp_after_until=False)
    tr_off = Trainer(mcfg=MCFG, ocfg=off, rcfg=RasterConfig(), bg=jnp.zeros((2,)))
    assert not tr_off.should_maintain(off.update_until + off.update_interval)

    # the clamp itself: inflate cov log-scales, offset log-scales untouched
    p = dict(state.params)
    p["scaling"] = p["scaling"].at[:, 3:].set(3.4).at[:, :3].set(1.7)
    state = state._replace(params=p)
    out = tr.maintain(state)
    np.testing.assert_array_equal(
        np.asarray(out.params["scaling"][:, 3:]), np.float32(0.05)
    )
    np.testing.assert_array_equal(
        np.asarray(out.params["scaling"][:, :3]), np.float32(1.7)
    )
    # everything else bit-identical
    for k in ("anchor", "offset", "feat", "rotation", "opacity"):
        np.testing.assert_array_equal(
            np.asarray(out.params[k]), np.asarray(state.params[k])
        )
