"""Dynamic Waymo decomposition: synthetic DyNFL bundle -> sub-scenes."""
import json
import os

import numpy as np
import pytest

from lidargs_tpu.data.waymo_dynamic import (
    STATIC,
    WaymoDynamicScene,
    kabsch,
    read_dynamic_model,
    read_dynamic_scene,
)
from lidargs_tpu.lidar.beams import uniform_beam_inclinations

H, W, N = 8, 64, 50


def _box_corners(center, dims, yaw):
    """8 corners in the reference ordering (0: -x-y-z ... with x along 0->4,
    y along 0->3, z along 0->1)."""
    dx, dy, dz = dims
    local = np.array([
        [0, 0, 0], [0, 0, dz], [0, dy, dz], [0, dy, 0],
        [dx, 0, 0], [dx, 0, dz], [dx, dy, dz], [dx, dy, 0],
    ]) - np.array([dx, dy, dz]) / 2.0
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return local @ R.T + center


def _make_bundle(root):
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    beams = uniform_beam_inclinations(5.0, 20.0, H)

    dist = rng.uniform(5, 60, (N, H, W)).astype(np.float32)
    dist[:, :, :4] = 0.0                                  # some dropped rays
    inten = rng.uniform(0, 1, (N, H, W)).astype(np.float32)
    elong = np.zeros((N, H, W), np.float32)
    np.save(os.path.join(root, "range_images1.npy"),
            np.stack([dist, inten, elong], -1))

    # one dynamic vehicle ("car") occupying a pixel block in every frame,
    # one static object ("wall")
    obj_idx = np.full((N, H, W), -1, np.int64)
    obj_idx[:, 2:6, 10:20] = 0                            # car (per-frame idx)
    obj_idx[:, 0:2, 40:50] = 1                            # wall
    np.save(os.path.join(root, "ray_object_indices.npy"), obj_idx)

    np.save(os.path.join(root, "normals.npy"),
            np.zeros((N, H, W, 3), np.float32))
    np.save(os.path.join(root, "ray_origins.npy"),
            np.zeros((N, H, W, 3), np.float32))
    np.save(os.path.join(root, "ray_dirs.npy"),
            np.zeros((N, H, W, 3), np.float32))
    np.save(os.path.join(root, "valid_normal_flags.npy"),
            np.ones((N, H, W), bool))

    car, wall = "car_1", "wall_1"
    ids_per_frame = np.array([[car, wall]] * N, dtype=object)
    types_per_frame = np.array([[1, 3]] * N, dtype=object)
    np.save(os.path.join(root, "object_ids_per_frame.npy"), ids_per_frame)
    np.save(os.path.join(root, "objects_id_types_per_frame.npy"),
            types_per_frame)

    frames = list(range(N))
    corners = [
        _box_corners(np.array([20.0 + 0.8 * f, 3.0, 1.0]), (4.0, 2.0, 1.6),
                     yaw=0.02 * f)
        for f in frames
    ]
    tsfms = [np.eye(4) for _ in frames]
    np.save(os.path.join(root, "objects_id_2_tsfm.npy"),
            np.array({car: tsfms}, dtype=object))
    np.save(os.path.join(root, "objects_id_2_corners.npy"),
            np.array({car: corners, wall: corners[:1]}, dtype=object))
    np.save(os.path.join(root, "objects_id_2_anchors.npy"),
            np.array({car: corners[0], wall: corners[0]}, dtype=object))
    np.save(os.path.join(root, "objects_id_2_frameidx.npy"),
            np.array({car: frames, wall: [0]}, dtype=object))
    np.save(os.path.join(root, "objects_id_2_dynamic_flag.npy"),
            np.array({car: True, wall: False}, dtype=object))

    np.save(os.path.join(root, "beam_inclinations.npy"), beams)

    poses = []
    for i in range(200):
        p = np.eye(4)
        p[:3, 3] = [0.4 * i, 0.0, 2.0]
        poses.append({"lidar2world": p.tolist()})
    with open(os.path.join(root, "meta_info.json"), "w") as f:
        json.dump({"frames": poses}, f)
    return beams


def test_kabsch_recovers_rigid_transform():
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(30, 3))
    ang = 0.7
    R0 = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t0 = np.array([1.0, -2.0, 0.5])
    x2 = x1 @ R0.T + t0
    R, t = kabsch(x1, x2)
    np.testing.assert_allclose(R, R0, atol=1e-8)
    np.testing.assert_allclose(t, t0, atol=1e-8)
    assert np.linalg.det(R) > 0.99


def test_dynamic_scene_indexing(tmp_path):
    _make_bundle(str(tmp_path))
    sc = WaymoDynamicScene(str(tmp_path))
    assert sc.dynamic_object_counter == 1
    assert sc.dynamic_object_ids() == ["car_1"]
    # the static wall is type 3 / non-dynamic -> excluded
    assert "wall_1" not in sc.object_id_2_global_idx
    aabb = sc.object_aabb("car_1")
    assert (aabb[3:] > aabb[:3]).all()


def test_masks_partition_valid_pixels(tmp_path):
    _make_bundle(str(tmp_path))
    sc = WaymoDynamicScene(str(tmp_path))
    static, car = sc.masks_for_object(0, "car_1")
    base = sc.first_masks[0] & sc.valid_normal_flag[0]
    np.testing.assert_array_equal(static | car, base)
    assert not (static & car).any()
    assert car[3, 15] and not car[0, 45]
    # global static mask cuts the car but keeps the (static) wall pixels
    sm = sc.static_mask(0)
    assert not sm[3, 15] and sm[0, 45]


def test_object_to_world_is_rigid(tmp_path):
    _make_bundle(str(tmp_path))
    sc = WaymoDynamicScene(str(tmp_path))
    o2w = sc.object_to_world(5, "car_1")
    R = o2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    assert np.linalg.det(R) > 0.99


def test_read_dynamic_scene_builds_subscenes(tmp_path):
    _make_bundle(str(tmp_path))
    sc, models = read_dynamic_scene(str(tmp_path), init_samples=5000)
    ids = [m.model_id for m in models]
    assert ids == [STATIC, "car_1"]
    bg, car = models
    assert len(bg.train_frames) == 46 and len(bg.test_frames) == 4
    assert bg.init_points.shape == (5000, 3)
    assert car.init_points.shape == (5000, 3)
    # masks ride on the frames
    fr = bg.train_frames[0]
    assert fr.pixel_mask is not None and bool(fr.pixel_mask.any())
    # canonical object points == sensor points through lidar->object
    pts_c = sc.object_points_canonical(0, 0, "car_1")
    _, m = sc.masks_for_object(0, "car_1")
    pts_s = sc._masked_points(0, m)
    l2o = np.linalg.inv(np.linalg.inv(sc.l2w[0]) @ sc.object_to_world(0, "car_1"))
    np.testing.assert_allclose(pts_c, pts_s @ l2o[:3, :3].T + l2o[:3, 3],
                               atol=1e-5)

    # masked losses run end-to-end on a dynamic frame
    import jax
    import jax.numpy as jnp

    from lidargs_tpu.train.losses import lidar_losses

    color = jnp.zeros((2, H, W))
    depth = jnp.zeros((H, W))
    lt = jax.jit(lambda c, d, f: lidar_losses(
        c, d, f.gt_image, jnp.ones((4, 3)), jnp.ones((4,)),
        pixel_mask=f.pixel_mask))(color, depth, fr)
    assert np.isfinite(float(lt.total))


def test_too_few_frames_returns_none(tmp_path):
    _make_bundle(str(tmp_path))
    sc = WaymoDynamicScene(str(tmp_path))
    assert read_dynamic_model(sc, "wall_1") is None


@pytest.mark.heavy  # dynamic-scene convergence run (43s)
def test_dynamic_decomposition_trains_end_to_end(tmp_path):
    """Background + dynamic-vehicle sub-scenes train through the masked
    losses — the workflow the reference's dynamic mode promises but cannot
    run as released (dataset_readers_dynmaic.py:121 syntax error,
    readme.md:40)."""
    import functools

    import jax
    import jax.numpy as jnp

    from lidargs_tpu.config import ModelConfig, OptConfig, RasterConfig
    from lidargs_tpu.data.waymo_dynamic import read_dynamic_scene
    from lidargs_tpu.models.field import init_field_from_points
    from lidargs_tpu.train.trainer import init_train_state, train_step

    root = str(tmp_path / "ctx")
    _make_bundle(root)
    _, models = read_dynamic_scene(root, init_samples=4000, min_frames=3,
                                   min_points=20)
    assert len(models) >= 2          # background + the car
    mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8,
                       anchor_capacity=4096)
    rcfg = RasterConfig(max_visible=4096, max_tiles_per_gaussian=8,
                        tile_capacity=64, chunk=8)
    ocfg = OptConfig(start_stat=0)
    for md in models[:2]:
        field = init_field_from_points(
            jax.random.key(0), mcfg, md.init_points, voxel_size=2.0)
        state = init_train_state(field, mcfg)
        step = jax.jit(functools.partial(
            train_step, bg=jnp.zeros((2,), jnp.float32),
            mcfg=mcfg, rcfg=rcfg, ocfg=ocfg))
        losses = []
        for it in range(8):
            fr = md.train_frames[it % len(md.train_frames)]
            state, m = step(state, fr)
            losses.append(float(m.loss.total))
        assert np.isfinite(losses).all(), (md.model_id, losses)
        assert losses[-1] < losses[0], (md.model_id, losses)
