"""Aux components: COLMAP parsers, visualization, raydrop CE+Lovasz loss."""
import os
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
