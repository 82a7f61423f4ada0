"""Surfel (2DGS) rasterizer tests: analytic ray-plane depth, golden vs
tiled parity, dual visibility, distortion/median outputs, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidargs_tpu.config import RasterConfig, replace
from lidargs_tpu.ops.surfel import preprocess_surfels, render_surfels, SurfelCols
from lidargs_tpu.utils.testing import make_scene

CFG = RasterConfig(max_visible=512, max_tiles_per_gaussian=64, tile_capacity=256,
                   chunk=8)


def _surfel_scene(key, n=150, H=32, W=256):
    """Random surfels on a shell facing the sensor-ish."""
    sc = make_scene(key, n=n, H=H, W=W)
    k1, k2 = jax.random.split(jax.random.key(7))
    scales2 = jax.random.uniform(k1, (n, 2), minval=0.3, maxval=1.2)
    return sc, scales2


def _pack(sc, scales2, cfg=CFG, means=None, quats=None, opac=None):
    return preprocess_surfels(
        sc.means3d if means is None else means,
        scales2,
        sc.quats if quats is None else quats,
        sc.opacities if opac is None else opac,
        sc.feat, sc.mask, sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, cfg,
    )


def test_perpendicular_surfel_depth_is_range():
    """A surfel facing the sensor dead-on along +x: the ray-plane
    intersection depth must equal the center range on the central ray."""
    H, W = 32, 256
    sc, _ = _surfel_scene(jax.random.key(0), n=1, H=H, W=W)
    r = 20.0
    # identity quat -> local z = +z; rotate so normal is +x (toward sensor):
    # quat for 90deg rotation around y: (cos45, 0, sin45, 0)
    q = jnp.array([[np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0]], jnp.float32)
    beams = sc.beams
    row = H // 2
    alpha = float(beams[H - 1 - row])
    mean = r * jnp.array([[np.cos(alpha), 0.0, np.sin(alpha)]], jnp.float32)
    pk = _pack(sc, jnp.full((1, 2), 2.0), means=mean, quats=q,
               opac=jnp.array([5.0]))
    out = jax.jit(lambda p: render_surfels(
        p, sc.beams, sc.W, jnp.zeros((2,)), CFG))(pk)
    col = W // 2  # beta=0 -> p_c = W/2
    assert float(out.occ[row, col]) > 0.9
    # depth on the central pixel is the exact plane distance
    np.testing.assert_allclose(float(out.depth[row, col]) /
                               float(out.occ[row, col]), r, rtol=1e-3)
    # rendered normal points toward the sensor (negative ray direction)
    nrm = np.asarray(out.normal[:, row, col]) / float(out.occ[row, col])
    np.testing.assert_allclose(nrm, [-np.cos(alpha), 0, -np.sin(alpha)], atol=1e-2)


def test_tiled_matches_golden():
    sc, scales2 = _surfel_scene(jax.random.key(1))
    pk = _pack(sc, scales2)
    bg = jnp.asarray([0.2, 0.6], jnp.float32)
    g = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, bg, CFG, golden=True))(pk)
    t = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, bg, CFG))(pk)
    assert float(t.n_dropped) == 0 and float(t.n_overflow) == 0
    np.testing.assert_allclose(np.asarray(t.color), np.asarray(g.color), atol=2e-6)
    np.testing.assert_allclose(np.asarray(t.depth), np.asarray(g.depth), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.normal), np.asarray(g.normal), atol=2e-6)
    np.testing.assert_allclose(np.asarray(t.median_depth), np.asarray(g.median_depth),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.distortion), np.asarray(g.distortion),
                               atol=1e-4)
    assert float(t.occ.max()) > 0.5


def test_dual_visibility_normals_face_sensor():
    """DUAL_VISIABLE: packed normals satisfy dot(center_dir, n) < 0."""
    sc, scales2 = _surfel_scene(jax.random.key(2))
    pk = _pack(sc, scales2)
    S = SurfelCols
    valid = np.asarray(pk[:, S.validf(2)]) > 0
    tw = np.asarray(pk[:, S.TW])
    nrm = np.asarray(pk[:, S.NORMAL])
    dots = (tw * nrm).sum(1)[valid]
    assert (dots < 0).all()


def test_distortion_zero_for_single_surface():
    """One isolated surfel -> all weight at one depth -> ~zero distortion;
    two stacked semi-transparent surfels -> positive distortion."""
    H, W = 32, 256
    sc, _ = _surfel_scene(jax.random.key(3), n=2, H=H, W=W)
    q = jnp.tile(jnp.array([[np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0]]),
                 (2, 1)).astype(jnp.float32)
    row = H // 2
    alpha = float(sc.beams[H - 1 - row])
    d = jnp.array([np.cos(alpha), 0.0, np.sin(alpha)], jnp.float32)
    means = jnp.stack([10.0 * d, 40.0 * d])
    pk1 = _pack(sc, jnp.full((2, 2), 2.0), means=means, quats=q,
                opac=jnp.array([5.0, 0.0]))     # second surfel off
    pk2 = _pack(sc, jnp.full((2, 2), 2.0), means=means, quats=q,
                opac=jnp.array([0.6, 0.6]))     # two translucent surfaces
    f = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, jnp.zeros((2,)), CFG))
    o1, o2 = f(pk1), f(pk2)
    col = W // 2
    # m = far/(far-near)*(1-near/depth) maps depths 10/40 -> ~0.9825/0.9975,
    # so the two-surface distortion ~ w1*w2*(dm)^2 ~ 3e-5; the single-surface
    # one is ~1e3x smaller (only within-surfel depth spread)
    assert float(o1.distortion[row, col]) < 1e-6
    assert float(o2.distortion[row, col]) > 1e-5
    assert float(o2.distortion[row, col]) > 30 * float(o1.distortion[row, col])
    # median depth of the translucent stack is the first surface
    np.testing.assert_allclose(float(o2.median_depth[row, col]), 10.0, rtol=0.05)


def test_surfel_gradients_finite_and_nonzero():
    sc, scales2 = _surfel_scene(jax.random.key(4), n=80, H=16, W=128)
    bg = jnp.zeros((2,), jnp.float32)
    target = jax.random.uniform(jax.random.key(5), (2, 16, 128))

    def loss(means, scales2, quats, opac, feat):
        pk = preprocess_surfels(means, scales2, quats, opac, feat, sc.mask,
                                sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, CFG)
        o = render_surfels(pk, sc.beams, sc.W, bg, CFG)
        return (jnp.mean((o.color - target) ** 2) + 0.1 * jnp.mean(o.depth)
                + 0.01 * jnp.mean(o.distortion) + 0.01 * jnp.mean(o.normal ** 2))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
        sc.means3d, scales2, sc.quats, sc.opacities, sc.feat
    )
    total = 0.0
    for x in g:
        assert bool(jnp.isfinite(x).all())
        total += float(jnp.abs(x).sum())
    assert total > 0.0


def test_render_field_surfel_end_to_end():
    """Neural Gaussian Field -> surfel splat: runs and is differentiable."""
    import numpy as _np
    import jax.random as jr
    from lidargs_tpu.config import ModelConfig
    from lidargs_tpu.lidar.beams import uniform_beam_inclinations
    from lidargs_tpu.lidar.frames import LidarFrame
    from lidargs_tpu.models.field import init_field_from_points, render_field_surfel

    H, W = 16, 256
    mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8, anchor_capacity=1024)
    rcfg = RasterConfig(max_visible=2048, max_tiles_per_gaussian=16,
                        tile_capacity=64, chunk=8)
    rng = _np.random.default_rng(0)
    az = rng.uniform(-_np.pi, _np.pi, 800)
    el = rng.uniform(-0.3, 0.1, 800)
    r = rng.uniform(5.0, 50.0, 800)
    pts = _np.stack([r * _np.cos(el) * _np.cos(az), r * _np.cos(el) * _np.sin(az),
                     r * _np.sin(el)], -1)
    beams = uniform_beam_inclinations(6.0, 24.0, H)
    gt = _np.zeros((3, H, W), _np.float32)
    frame = LidarFrame.from_lidar2world(_np.eye(4), beams, gt, uid=0)
    field = init_field_from_points(jr.key(0), mcfg, pts, voxel_size=2.0)
    bg = jnp.zeros((2,), jnp.float32)

    def loss(params):
        out, _, _ = render_field_surfel(params, field.valid, frame, mcfg, rcfg, bg)
        return jnp.mean(out.color ** 2) + 0.1 * jnp.mean(out.depth) \
            + 0.01 * jnp.mean(out.distortion)

    l, g = jax.jit(jax.value_and_grad(loss))(field.params)
    assert bool(jnp.isfinite(l))
    gs = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert _np.isfinite(gs) and gs > 0


def test_surfel_pallas_matches_xla():
    """Pallas surfel forward (interpret mode on CPU) vs the XLA scan,
    including the auxiliary channels; gradients route through the XLA VJP."""
    cfgx = replace(CFG, backend="xla", tile_capacity=64, pallas_chunk=8)
    cfgp = replace(CFG, backend="pallas", tile_capacity=64, pallas_chunk=8)
    sc, scales2 = _surfel_scene(jax.random.key(11), n=120, H=16, W=256)
    pk = _pack(sc, scales2, cfg=cfgx)
    bg = jnp.asarray([0.2, 0.6], jnp.float32)
    a = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, bg, cfgx))(pk)
    b = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, bg, cfgp))(pk)
    cmp = lambda x, y, **kw: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=1e-5, **kw)
    cmp(b.color, a.color, atol=1e-5)
    cmp(b.depth, a.depth, atol=1e-4)
    cmp(b.normal, a.normal, atol=1e-5)
    cmp(b.median_depth, a.median_depth, atol=1e-4)
    cmp(b.distortion, a.distortion, atol=1e-4)
    assert float(b.occ.max()) > 0.3

    def loss(pk, cfg):
        o = render_surfels(pk, sc.beams, sc.W, bg, cfg)
        return (jnp.mean(o.color ** 2) + 0.1 * jnp.mean(o.depth)
                + 0.01 * jnp.mean(o.distortion))

    gx = jax.jit(jax.grad(lambda p: loss(p, cfgx)))(pk)
    gp = jax.jit(jax.grad(lambda p: loss(p, cfgp)))(pk)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=5e-5, rtol=2e-3)


def test_surfel_bwd_kernel_matches_autodiff_oracle():
    """The hand-derived single-pass backward kernel (pallas_surfel
    _bwd_kernel, covering surfel backward.cu:370-692) against autodiff of
    the XLA chunk scan, with cotangents on EVERY output row — color, depth,
    final_T, normal, median, distortion, M1/M2 — so all chains are hit:
    ray-plane (dλ2/dTw, dλ2/dnormal), ρ2d center fallback, distortion
    prefix/suffix terms, and the median equality-routing."""
    from lidargs_tpu.ops.pallas_surfel import (
        OUT_ROWS, _bwd_call, _xla_rows, surfel_composite_tiles,
    )
    from lidargs_tpu.ops.rasterize import _pix_blocks, _tile_pixels, bin_instances

    cfg = replace(CFG, tile_capacity=64, pallas_chunk=8, max_visible=512)
    H, W, C = 16, 256, 2
    sc, scales2 = _surfel_scene(jax.random.key(21), n=160, H=H, W=W)
    pk = _pack(sc, scales2, cfg=cfg)
    S = SurfelCols
    depth = pk[:, S.DEPTH]
    _, sel = jax.lax.sort((depth, jnp.arange(pk.shape[0], dtype=jnp.int32)),
                          num_keys=1, is_stable=True)
    pkv = jnp.take(pk, sel, axis=0)
    vvalid = pkv[:, S.validf(C)] > 0.0
    gy, gx_ = cfg.grid_shape(H, W)
    rect = pkv[:, S.rect(C)].astype(jnp.int32)
    center = pkv[:, S.center(C)]
    ids, counts, _ = bin_instances(rect, center, vvalid, cfg, gx_, gy)
    Tn, K = ids.shape
    inst = jnp.take(pkv, ids.reshape(-1), axis=0).reshape(Tn, K, -1)
    pix_x, pix_y, dirs = _tile_pixels(H, W, cfg, gx_, gy, sc.beams)
    blk = _pix_blocks(pix_x, pix_y, dirs)

    # forward parity on the new M1/M2 rows too
    out_k = jax.jit(lambda i: surfel_composite_tiles(i, counts, blk, C, cfg))(inst)
    out_x = jax.jit(lambda i: _xla_rows(i, counts, blk, C, cfg))(inst)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=1e-4, rtol=1e-4)

    # cotangent on every row (incl. median + M1/M2)
    g = jax.random.normal(jax.random.key(3), out_k.shape) * jnp.where(
        jnp.arange(OUT_ROWS)[None, :, None] < C + 9, 1.0, 0.0
    )
    dinst_k = jax.jit(lambda i: _bwd_call(i, counts, blk, out_k, g, C, cfg))(inst)
    _, vjp = jax.vjp(lambda i: _xla_rows(i, counts, blk, C, cfg), inst)
    (dinst_x,) = vjp(g)
    dk, dx = np.asarray(dinst_k), np.asarray(dinst_x)
    assert np.isfinite(dk).all()
    scale = np.abs(dx).max()
    assert scale > 0
    np.testing.assert_allclose(dk, dx, atol=3e-4 * scale, rtol=3e-3)


@pytest.mark.heavy  # fused-gather is default-off (58s); core keeps the oracle + xla-parity checks
def test_surfel_fused_gather_matches_materialized():
    """Surfel fused-gather (windowed-DMA) path vs the materialized pallas
    path: forward bitwise on every output channel, full-pipeline grads
    match."""
    cfgm = replace(CFG, backend="pallas", tile_capacity=64, pallas_chunk=8,
                   instance_capacity=40960)
    cfgf = replace(cfgm, fused_gather=True)
    sc, scales2 = _surfel_scene(jax.random.key(31), n=140, H=16, W=256)
    pk = _pack(sc, scales2, cfg=cfgm)
    bg = jnp.asarray([0.1, 0.4], jnp.float32)
    a = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, bg, cfgm))(pk)
    b = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, bg, cfgf))(pk)
    for field in ("color", "depth", "normal", "median_depth", "distortion",
                  "final_T"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b, field)), np.asarray(getattr(a, field)),
            err_msg=field,
        )
    assert int(b.n_overflow) == int(a.n_overflow)
    assert float(a.occ.max()) > 0.3

    def loss(pk, cfg):
        o = render_surfels(pk, sc.beams, sc.W, bg, cfg)
        return (jnp.mean(o.color ** 2) + 0.1 * jnp.mean(o.depth)
                + 0.01 * jnp.mean(o.distortion) + 0.01 * jnp.mean(o.normal ** 2))

    gm = jax.jit(jax.grad(lambda p: loss(p, cfgm)))(pk)
    gf = jax.jit(jax.grad(lambda p: loss(p, cfgf)))(pk)
    assert bool(jnp.isfinite(gf).all())
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gm),
                               rtol=1e-5, atol=1e-7)


def test_surfel_pallas_tile_h4_matches_1x128():
    """NPIX-generic surfel kernels (r4): a 4x128 physical tiling must
    reproduce the 1x128 image through the pallas path — incl. the
    auxiliary channels and gradients through the hand backward."""
    base = replace(CFG, backend="pallas", tile_capacity=256, pallas_chunk=8)
    h4 = replace(base, tile_h=4, tile_capacity=1024)
    sc, scales2 = _surfel_scene(jax.random.key(13), n=120, H=16, W=256)
    pk = _pack(sc, scales2, cfg=base)
    bg = jnp.asarray([0.2, 0.6], jnp.float32)
    a = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, bg, base))(pk)
    assert int(a.n_overflow) == 0
    b = jax.jit(lambda p: render_surfels(p, sc.beams, sc.W, bg, h4))(pk)
    assert int(b.n_overflow) == 0
    cmp = lambda x, y, **kw: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=1e-5, **kw)
    cmp(b.color, a.color, atol=1e-5)
    cmp(b.depth, a.depth, atol=1e-4)
    cmp(b.normal, a.normal, atol=1e-5)
    cmp(b.median_depth, a.median_depth, atol=1e-4)
    cmp(b.distortion, a.distortion, atol=1e-4)

    def loss(pk, cfg):
        o = render_surfels(pk, sc.beams, sc.W, bg, cfg)
        return (jnp.mean(o.color ** 2) + 0.1 * jnp.mean(o.depth)
                + 0.01 * jnp.mean(o.distortion))

    g1 = jax.jit(jax.grad(lambda p: loss(p, base)))(pk)
    g4 = jax.jit(jax.grad(lambda p: loss(p, h4)))(pk)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(g1),
                               atol=5e-5, rtol=2e-3)
