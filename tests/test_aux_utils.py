"""Aux components: COLMAP parsers, visualization, raydrop CE+Lovasz loss."""
import os
import json
import struct

import jax
import jax.numpy as jnp
import numpy as np

from lidargs_tpu.data.colmap import (
    qvec2rotmat,
    read_cameras_binary,
    read_cameras_text,
    read_colmap_scene,
    read_images_binary,
    read_points3d_binary,
    rotmat2qvec,
)
from lidargs_tpu.train.losses import (
    get_ce_weights,
    lovasz_grad,
    lovasz_softmax_flat,
    raydrop_lossf,
)
from lidargs_tpu.utils.visualize import (
    colormap,
    normals_from_range,
    save_image,
)


# --- synthetic COLMAP model writer (binary format) ---

def _write_colmap_bin(d):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))          # PINHOLE
        f.write(struct.pack("<dddd", 500.0, 500.0, 320.0, 240.0))
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0])             # 45deg about y
    t = np.array([1.0, -2.0, 3.0])
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<dddd", *q))
        f.write(struct.pack("<ddd", *t))
        f.write(struct.pack("<i", 1))
        f.write(b"frame0.png\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ddq", 10.5, 20.5, 42))
        f.write(struct.pack("<ddq", 30.0, 40.0, -1))
    pts = np.array([[1.0, 2.0, 3.0], [-4.0, 5.0, -6.0]])
    rgb = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<ddd", *pts[i]))
            f.write(struct.pack("<BBB", *rgb[i]))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))                      # track len
            f.write(struct.pack("<ii", 7, 0))                  # track elem
    return q, t, pts, rgb


def test_colmap_binary_roundtrip(tmp_path):
    d = str(tmp_path / "sparse")
    q, t, pts, rgb = _write_colmap_bin(d)
    cams = read_cameras_binary(os.path.join(d, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 500, 320, 240])
    imgs = read_images_binary(os.path.join(d, "images.bin"))
    im = imgs[7]
    assert im.name == "frame0.png" and im.camera_id == 1
    np.testing.assert_allclose(im.qvec, q)
    np.testing.assert_allclose(im.xys, [[10.5, 20.5], [30.0, 40.0]])
    np.testing.assert_array_equal(im.point3D_ids, [42, -1])
    xyz, col, err = read_points3d_binary(os.path.join(d, "points3D.bin"))
    np.testing.assert_allclose(xyz, pts)
    np.testing.assert_array_equal(col, rgb)

    scene = read_colmap_scene(d)
    c2w = scene.poses_c2w[7]
    R = qvec2rotmat(q)
    np.testing.assert_allclose(c2w[:3, :3], R.T, atol=1e-12)
    np.testing.assert_allclose(c2w[:3, 3], -R.T @ t, atol=1e-12)


def test_colmap_text_parser(tmp_path):
    p = str(tmp_path / "cameras.txt")
    with open(p, "w") as f:
        f.write("# comment\n1 SIMPLE_PINHOLE 100 80 50.0 50.0 40.0\n")
    cams = read_cameras_text(p)
    assert cams[1].model == "SIMPLE_PINHOLE" and cams[1].height == 80


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0]) if q[0] != 0 else 1.0
        R = qvec2rotmat(q)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def test_colormap_and_png(tmp_path):
    x = np.linspace(0, 80, 64).reshape(8, 8)
    rgb = colormap(x, 0, 80)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    assert not np.allclose(rgb[0, 0], rgb[-1, -1])
    p = str(tmp_path / "img.png")
    save_image(p, rgb)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_normals_from_range_flat_wall():
    """A wall at constant x: normals must be ~(-1, 0, 0) (toward sensor)."""
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations

    H, W = 32, 64
    beams = uniform_beam_inclinations(10.0, 20.0, H)
    rows = np.arange(H)
    cols = np.arange(W)
    alpha = beams[H - 1 - rows][:, None]
    beta = -(cols[None, :] - W / 2.0) / W * 2.0 * np.pi
    x0 = 20.0
    with np.errstate(divide="ignore"):
        d = x0 / (np.cos(alpha) * np.cos(beta))
    d[(d < 0) | ~np.isfinite(d)] = 0.0
    n = normals_from_range(d, beams)
    mid = n[H // 2 - 4 : H // 2 + 4, W // 2 - 4 : W // 2 + 4]
    np.testing.assert_allclose(mid, np.broadcast_to([-1.0, 0, 0], mid.shape),
                               atol=0.05)


def test_lovasz_grad_is_jaccard_deltas():
    gt = jnp.array([1.0, 1.0, 0.0, 1.0])
    g = lovasz_grad(gt)
    # first element is 1 - (gts-1)/(gts) for the first error
    assert g.shape == (4,)
    assert float(jnp.abs(g).sum()) > 0


def test_raydrop_lossf_perfect_vs_wrong():
    gt = jnp.array([0, 1, 1, 0, 1, -1])        # -1 ignored
    good = jnp.array([[5.0, -5], [-5, 5], [-5, 5], [5, -5], [-5, 5], [0, 0]])
    bad = -good
    lg = float(raydrop_lossf(good, gt))
    lb = float(raydrop_lossf(bad, gt))
    # the ignored row still contributes its 0.5 softmax to the Lovasz errors
    # (the reference passes ignore labels unfiltered to lovasz_softmax_flat,
    # loss_utils.py:96-99) -> 'perfect' is small but nonzero
    assert lg < 0.05
    assert lb > lg + 0.5


def test_ce_weights_inverse_frequency():
    gt = jnp.array([0] * 90 + [1] * 10)
    w = get_ce_weights(gt, 2)
    assert float(w[1]) > float(w[0])
    np.testing.assert_allclose(float(w[0]), np.sqrt(100 / 90), rtol=1e-5)


def test_step_timer_and_tb_logger(tmp_path):
    import time as _time

    from lidargs_tpu.utils.profiling import StepTimer, TensorBoardLogger

    t = StepTimer().start()
    for _ in range(5):
        _time.sleep(0.002)
        t.tick()
    s = t.stats(skip=0)
    assert s["mean_ms"] >= 1.0 and s["steps_per_s"] > 0

    tb = TensorBoardLogger(str(tmp_path / "tb"))
    assert tb.active
    tb.scalar("x", 1.0, 0)
    tb.scalars({"a": 1, "b": 2}, 1, prefix="pre/")
    tb.depth_image("d", np.random.default_rng(0).uniform(0, 80, (8, 16)), 0)
    tb.flush()
    tb.close()
    assert any(os.scandir(str(tmp_path / "tb")))


def test_profiler_trace_capture(tmp_path):
    import jax
    import jax.numpy as jnp

    from lidargs_tpu.utils.profiling import annotate, trace

    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x))
    x = jnp.ones((64, 64))
    with trace(logdir):
        with annotate("hot"):
            jax.block_until_ready(f(x))
    assert os.path.isdir(logdir) and any(os.scandir(logdir))


# --- camera-image scene readers (Blender/NeRF-synthetic + dispatch) ---

def _write_blender_scene(root, n=6, w=32, h=24):
    """NeRF-synthetic layout: transforms_{train,test}.json + RGBA PNGs on a
    circle looking at the origin (OpenGL camera axes: -z forward)."""
    from PIL import Image as PILImage

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rng = np.random.default_rng(0)

    def look_at(eye):
        fwd = -eye / np.linalg.norm(eye)          # toward origin
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        c2w = np.eye(4)
        # OpenGL: x right, y up, z BACK
        c2w[:3, 0] = right
        c2w[:3, 1] = true_up
        c2w[:3, 2] = -fwd
        c2w[:3, 3] = eye
        return c2w

    frames = []
    for i in range(n):
        th = 2 * np.pi * i / n
        eye = 4.0 * np.array([np.cos(th), np.sin(th), 0.5])
        img = (rng.uniform(size=(h, w, 4)) * 255).astype(np.uint8)
        img[..., 3] = 255
        name = f"train/r_{i}"
        PILImage.fromarray(img, "RGBA").save(os.path.join(root, name + ".png"))
        frames.append({"file_path": name,
                       "transform_matrix": look_at(eye).tolist()})
    meta = {"camera_angle_x": 0.6911, "frames": frames}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "transforms_test.json"), "w") as f:
        json.dump({"camera_angle_x": 0.6911, "frames": frames[:2]}, f)


def test_blender_scene_reader(tmp_path):
    """read_blender_scene: poses invert correctly (camera center round-trip),
    fovy from camera_angle_x, alpha-blended images, random seed cloud."""
    from lidargs_tpu.data.blender import fov2focal, load_camera_scene

    root = str(tmp_path / "nerf")
    _write_blender_scene(root)
    sc = load_camera_scene(root)         # dispatch: no sparse/ -> blender
    assert len(sc.train_cameras) == 6 and len(sc.test_cameras) == 2
    cam = sc.train_cameras[0]
    assert cam.image.shape == (24, 32, 3) and cam.image.dtype == np.float32
    # camera center: c2w translation must equal the ring eye point
    eye = 4.0 * np.array([1.0, 0.0, 0.5])
    np.testing.assert_allclose(cam.c2w[:3, 3], eye, atol=1e-6)
    # the COLMAP-convention forward axis (+z of c2w) points AT the origin
    fwd = cam.c2w[:3, 2]
    np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-6)
    # fovy derived via shared focal
    fx = fov2focal(0.6911, 32)
    assert abs(fov2focal(cam.fov_y, 24) - fx) < 1e-9
    # nerf++ normalization: ring centroid ~ (0, 0, 2), radius ~ 1.1 * ~4
    np.testing.assert_allclose(-sc.translate, [0, 0, 2.0], atol=1e-6)
    assert 3.5 < sc.radius < 4.6
    assert sc.points.shape == (10_000, 3)
    assert np.abs(sc.points).max() <= 1.3 + 1e-6


def test_colmap_camera_scene_dispatch(tmp_path):
    """COLMAP layout -> read_colmap_camera_scene through the dispatcher;
    pose/fov conversion against the synthetic binary model."""
    from lidargs_tpu.data.blender import load_camera_scene

    root = str(tmp_path / "scene")
    d = os.path.join(root, "sparse", "0")
    q, t, pts, rgb = _write_colmap_bin(d)
    sc = load_camera_scene(root)
    assert len(sc.train_cameras) == 1 and not sc.test_cameras
    cam = sc.train_cameras[0]
    assert cam.width == 640 and cam.height == 480
    np.testing.assert_allclose(cam.fov_x, 2 * np.arctan(640 / (2 * 500.0)))
    # R is stored transposed (glm convention): R.T @ anything == w2c rot
    R = qvec2rotmat(q)
    np.testing.assert_allclose(cam.R, R.T, atol=1e-12)
    np.testing.assert_allclose(cam.T, t)
    # c2w center == -R^T t
    np.testing.assert_allclose(cam.c2w[:3, 3], -R.T @ t, atol=1e-9)
    np.testing.assert_allclose(sc.points, pts)
    np.testing.assert_allclose(sc.colors, rgb / 255.0)
    assert cam.image is None           # no images/ directory on disk


def test_wandb_logger_fake_module(monkeypatch):
    """WandbLogger drives the wandb API when importable (faked here; the
    real package is absent in this environment) and no-ops otherwise."""
    import sys
    import types

    from lidargs_tpu.utils.profiling import WandbLogger

    calls = []
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls.append(("init", kw))
    fake.log = lambda payload, step=None: calls.append(("log", payload, step))
    fake.finish = lambda: calls.append(("finish",))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    wb = WandbLogger("proj", run_name="run1", config={"a": 1})
    assert wb.active
    wb.log({"psnr": 21.5, "name": "skip-me"}, step=7, prefix="test/")
    wb.finish()
    assert calls[0][0] == "init" and calls[0][1]["project"] == "proj"
    assert calls[1] == ("log", {"test/psnr": 21.5}, 7)
    assert calls[-1] == ("finish",)

    monkeypatch.delitem(sys.modules, "wandb")
    import builtins
    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    wb2 = WandbLogger("proj")
    assert not wb2.active
    wb2.log({"x": 1.0})          # no-op, no crash
    wb2.finish()


def test_spherical_harmonics_basis():
    """eval_sh vs first principles: degree-0 is the constant band; the
    degree-1 bands reproduce an arbitrary linear function of the direction;
    rgb<->sh round-trips; and the basis is orthonormal under the sphere
    measure (Monte-Carlo check, degrees 0-2)."""
    from lidargs_tpu.utils.sh import eval_sh, rgb_to_sh, sh_to_rgb

    rng = np.random.default_rng(0)
    d = rng.normal(size=(4096, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    # deg 0: constant C0 * coeff
    sh0 = jnp.ones((1, 1, 1))
    np.testing.assert_allclose(np.asarray(eval_sh(0, sh0, d[:1])),
                               0.28209479177387814, rtol=1e-6)
    # rgb <-> dc round trip
    rgb = jnp.asarray(rng.uniform(size=(5, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(sh_to_rgb(rgb_to_sh(rgb))), rgb,
                               rtol=1e-5, atol=1e-6)
    # deg-1 linear reproduction: f(d) = a + b.d has an exact SH-1 expansion
    a, b = 0.7, np.array([0.3, -0.5, 0.2])
    C0, C1 = 0.28209479177387814, 0.4886025119029199
    coeffs = jnp.asarray(
        [[a / C0, -b[1] / C1, b[2] / C1, -b[0] / C1]], jnp.float32)[None]
    got = np.asarray(eval_sh(1, coeffs, d))[:, 0]
    want = a + np.asarray(d) @ b
    np.testing.assert_allclose(got, want, atol=1e-5)
    # orthonormality of bands 0..8 under uniform sphere sampling
    basis = []
    for i in range(9):
        c = jnp.zeros((1, 1, 9)).at[0, 0, i].set(1.0)
        basis.append(np.asarray(eval_sh(2, c, d))[:, 0])
    B = np.stack(basis)                     # [9, N]
    gram = 4 * np.pi * (B @ B.T) / d.shape[0]
    np.testing.assert_allclose(gram, np.eye(9), atol=0.15)


def test_cameras_json_dump(tmp_path):
    """cameras.json entries carry the c2w pose + pixel focals
    (utils/camera_utils.py:64-84)."""
    from lidargs_tpu.data.blender import load_camera_scene, save_cameras_json

    root = str(tmp_path / "nerf")
    _write_blender_scene(root, n=3)
    sc = load_camera_scene(root)
    out = save_cameras_json(str(tmp_path), sc)
    with open(out) as f:
        entries = json.load(f)
    assert len(entries) == 3 + 2           # train + test
    e0 = entries[0]
    cam = sc.train_cameras[0]
    np.testing.assert_allclose(e0["position"], cam.c2w[:3, 3], atol=1e-9)
    np.testing.assert_allclose(np.array(e0["rotation"]), cam.c2w[:3, :3],
                               atol=1e-9)
    np.testing.assert_allclose(
        e0["fx"], cam.width / (2 * np.tan(cam.fov_x / 2)), rtol=1e-9)


def test_camera_lists_by_scale(tmp_path):
    """Per-resolution-scale camera lists (scene/__init__.py:60-71 +
    upstream loadCam semantics, utils/camera_utils.py:23-62): images
    resized per scale, FoV preserved, -1 auto-cap at 1600 px, explicit
    target-width mode."""
    from lidargs_tpu.data.blender import (
        camera_lists_by_scale, load_camera_at_scale, load_camera_scene,
    )

    root = str(tmp_path / "nerf")
    _write_blender_scene(root)
    sc = load_camera_scene(root)                       # 32x24 images

    train, test = camera_lists_by_scale(sc, resolution_scales=(1.0, 2.0),
                                        resolution=1)
    assert set(train) == {1.0, 2.0} and set(test) == {1.0, 2.0}
    c1, c2 = train[1.0][0], train[2.0][0]
    assert (c1.width, c1.height) == (32, 24)
    assert (c2.width, c2.height) == (16, 12)
    assert c2.image.shape == (12, 16, 3)
    # FoV is resolution-invariant
    assert c2.fov_x == c1.fov_x and c2.fov_y == c1.fov_y
    # scale 1 with resolution 1 is a no-op (same pixels)
    np.testing.assert_array_equal(c1.image, sc.train_cameras[0].image)

    # power-of-two divisor mode
    c4 = load_camera_at_scale(sc.train_cameras[0], 1.0, resolution=4)
    assert (c4.width, c4.height) == (8, 6)

    # -1 auto mode: width <= 1600 -> untouched
    ca = load_camera_at_scale(sc.train_cameras[0], 1.0, resolution=-1)
    assert (ca.width, ca.height) == (32, 24)
    # -1 auto mode with a large synthetic camera: capped to 1600 wide
    big = sc.train_cameras[0]._replace(image=None, width=3200, height=2400)
    cb = load_camera_at_scale(big, 1.0, resolution=-1)
    assert (cb.width, cb.height) == (1600, 1200)
    # explicit target width
    cw = load_camera_at_scale(big, 1.0, resolution=800)
    assert (cw.width, cw.height) == (800, 600)


def test_nonfinite_snapshot_roundtrip(tmp_path):
    """Dump-state-on-nonfinite (the reference's rasterizer input snapshot,
    diff_lidargs_rasterization/__init__.py:84-96): finite loss is a no-op;
    a NaN loss dumps every render input, and the loaded snapshot re-renders
    to the same image (deterministic offline repro)."""
    import jax
    import jax.numpy as jnp
    from lidargs_tpu.config import ModelConfig, RasterConfig
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations
    from lidargs_tpu.lidar.frames import LidarFrame
    from lidargs_tpu.models.field import init_field_from_points, render_field
    from lidargs_tpu.utils.debug import (
        load_render_snapshot, snapshot_if_nonfinite,
    )

    mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8,
                       anchor_capacity=512)
    rcfg = RasterConfig(max_visible=256, max_tiles_per_gaussian=8,
                        tile_capacity=16, chunk=8)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, (300, 3))
    field = init_field_from_points(jax.random.key(0), mcfg, pts,
                                   voxel_size=4.0)
    H, W = 8, 256
    beams = uniform_beam_inclinations(10.0, 30.0, H)
    gt = rng.uniform(0, 1, (3, H, W)).astype(np.float32)
    frame = LidarFrame.from_lidar2world(np.eye(4), beams, gt, uid=3)

    # finite -> no dump
    assert snapshot_if_nonfinite(1.25, str(tmp_path), 100, field.params,
                                 field.valid, frame) is None
    assert not os.path.exists(tmp_path / "debug")

    # NaN -> dump, and the snapshot re-renders identically
    path = snapshot_if_nonfinite(float("nan"), str(tmp_path), 200,
                                 field.params, field.valid, frame)
    assert path is not None and os.path.exists(path)
    params2, valid2, frame2, extra = load_render_snapshot(path)
    assert int(extra["iteration"]) == 200
    bg = jnp.zeros((2,), jnp.float32)
    out1, _, _ = jax.jit(
        lambda p, v, f: render_field(p, v, f, mcfg, rcfg, bg)
    )(field.params, field.valid, frame)
    out2, _, _ = jax.jit(
        lambda p, v, f: render_field(p, v, f, mcfg, rcfg, bg)
    )(jax.tree.map(jnp.asarray, params2), jnp.asarray(valid2), frame2)
    np.testing.assert_array_equal(np.asarray(out1.color),
                                  np.asarray(out2.color))
    np.testing.assert_array_equal(np.asarray(out1.depth),
                                  np.asarray(out2.depth))
