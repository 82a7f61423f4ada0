"""Pallas compositing kernels vs the XLA scan path (forward + VJP).

Runs the kernels in interpret mode on CPU; on a real TPU the same tests
exercise the compiled kernels. The XLA path itself is checked against the
golden O(P*HW) renderer in test_render_parity.py, so agreement here chains
all the way to the oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidargs_tpu.config import RasterConfig, replace
from lidargs_tpu.ops import preprocess_gaussians, render_tiled
from lidargs_tpu.utils.testing import make_scene, scene_splats

# kernel layout needs tile_w=128/tile_h=1 and K % pallas_chunk == 0
XLA = RasterConfig(
    max_visible=512, max_tiles_per_gaussian=64, tile_capacity=64,
    chunk=8, pallas_chunk=8, backend="xla",
)
PAL = replace(XLA, backend="pallas")


def _both(key, n=200, H=32, W=256, xla=XLA, pal=PAL):
    sc = make_scene(key, n=n, H=H, W=W)
    splats = jax.jit(lambda: scene_splats(sc, xla))()
    bg = jnp.asarray([0.3, 0.7], jnp.float32)
    a = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, xla))(splats)
    b = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, pal))(splats)
    return sc, a, b


def test_pallas_forward_matches_xla():
    _, a, b = _both(jax.random.key(0))
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.occ), np.asarray(a.occ), atol=1e-5)
    assert float(a.occ.max()) > 0.5


def test_pallas_forward_heavy_overlap_and_early_exit():
    """Opaque pile-up saturates transmittance -> exercises the early-exit
    branch; results must still match the (no-early-exit) XLA scan."""
    xla = replace(XLA, tile_capacity=128)
    pal = replace(PAL, tile_capacity=128)
    _, a, b = _both(jax.random.key(1), n=400, H=16, W=128, xla=xla, pal=pal)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth), atol=1e-4)


def test_pallas_gradients_match_xla():
    sc = make_scene(jax.random.key(2), n=120, H=16, W=128)
    bg = jnp.zeros((2,), jnp.float32)
    target = jax.random.uniform(jax.random.key(3), (2, 16, 128))

    def loss_with(cfg):
        def f(means, scales, opac, feat):
            splats = preprocess_gaussians(
                means, scales, sc.quats, opac, feat, sc.mask,
                sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, cfg,
            )
            o = render_tiled(splats, sc.beams, sc.W, bg, cfg)
            return (
                jnp.mean((o.color - target) ** 2)
                + 0.1 * jnp.mean(o.depth)
                + 0.05 * jnp.mean(o.occ)
            )
        return f

    args = (sc.means3d, sc.scales, sc.opacities, sc.feat)
    g_x = jax.jit(jax.grad(loss_with(XLA), argnums=(0, 1, 2, 3)))(*args)
    g_p = jax.jit(jax.grad(loss_with(PAL), argnums=(0, 1, 2, 3)))(*args)
    total = 0.0
    for a, b in zip(g_x, g_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=2e-3
        )
        total += float(jnp.abs(a).sum())
    assert total > 0.0


def test_pallas_empty_tiles_are_background():
    """Tiles with zero instances must return bg color / T=1."""
    sc = make_scene(jax.random.key(4), n=4, H=16, W=256)
    splats = jax.jit(lambda: scene_splats(sc, PAL))()
    bg = jnp.asarray([0.25, 0.5], jnp.float32)
    out = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, PAL))(splats)
    occ = np.asarray(out.occ)
    color = np.asarray(out.color)
    empty = occ < 1e-6
    assert empty.any()
    np.testing.assert_allclose(color[0][empty], 0.25, atol=1e-6)
    np.testing.assert_allclose(color[1][empty], 0.5, atol=1e-6)


FUSED = replace(PAL, fused_gather=True)


def test_fused_gather_forward_matches_materialized():
    """composite_windows_pallas (windowed-DMA fused gather) against the
    materialized [T, K, F] kernel path — forward must be bitwise on the
    same instance data."""
    _, a, b = _both(jax.random.key(4), xla=PAL, pal=FUSED)
    np.testing.assert_array_equal(np.asarray(b.color), np.asarray(a.color))
    np.testing.assert_array_equal(np.asarray(b.depth), np.asarray(a.depth))
    np.testing.assert_array_equal(np.asarray(b.occ), np.asarray(a.occ))
    assert int(b.n_overflow) == int(a.n_overflow)
    assert float(a.occ.max()) > 0.5


def test_fused_gather_forward_with_overflow_and_budget():
    """Per-tile overflow (tiny K) + a tight instance budget: the fused path
    must agree with the materialized path instance-for-instance (both drop
    the same overflow rows) and count the same overflow."""
    base = dict(max_visible=512, max_tiles_per_gaussian=16, tile_capacity=16,
                chunk=8, pallas_chunk=8, instance_capacity=2048)
    pal = RasterConfig(backend="pallas", **base)
    fus = replace(pal, fused_gather=True)
    _, a, b = _both(jax.random.key(5), n=400, H=16, W=256, xla=pal, pal=fus)
    assert int(a.n_overflow) > 0
    assert int(b.n_overflow) == int(a.n_overflow)
    np.testing.assert_array_equal(np.asarray(b.color), np.asarray(a.color))
    np.testing.assert_array_equal(np.asarray(b.depth), np.asarray(a.depth))


@pytest.mark.heavy  # fused-gather is default-off (17s); forward coverage stays in core
def test_fused_gather_gradients_match_materialized():
    """Full-pipeline gradients through the fused path vs the materialized
    kernel path: the windowed dbuf write-back (overlap stomping + slot
    mask) must reproduce the per-tile dinst scatter-add exactly."""
    sc = make_scene(jax.random.key(6), n=150, H=16, W=128)
    bg = jnp.zeros((2,), jnp.float32)
    target = jax.random.uniform(jax.random.key(7), (2, 16, 128))

    def loss(means, scales, opac, feat, cfg):
        s = preprocess_gaussians(means, scales, sc.quats, opac, feat, sc.mask,
                                 sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, cfg)
        o = render_tiled(s, sc.beams, sc.W, bg, cfg)
        return (jnp.mean((o.color - target) ** 2) + 0.1 * jnp.mean(o.depth)
                + 0.05 * jnp.mean(o.occ))

    args = (sc.means3d, sc.scales, sc.opacities, sc.feat)
    gm = jax.jit(jax.grad(lambda *a: loss(*a, PAL), argnums=(0, 1, 2, 3)))(*args)
    gf = jax.jit(jax.grad(lambda *a: loss(*a, FUSED), argnums=(0, 1, 2, 3)))(*args)
    for m, f in zip(gm, gf):
        assert bool(jnp.isfinite(f).all())
        np.testing.assert_allclose(np.asarray(f), np.asarray(m),
                                   rtol=1e-5, atol=1e-7)


def test_pallas_tile_h2_matches_1x128():
    """NPIX-generic kernels: a 2x128 physical tiling must produce the same
    image as 1x128 (the parity-rect mask makes results tiling-independent)
    through the pallas path, the fused-gather path, and with matching
    gradients."""
    # overflow-free capacities: truncation differs between tilings by
    # design (per-tile nearest-K), so parity needs K ample on both
    base = replace(PAL, tile_capacity=256)
    h2 = replace(PAL, tile_h=2, tile_capacity=512)
    h2f = replace(h2, fused_gather=True)
    sc = make_scene(jax.random.key(8), n=200, H=32, W=256)
    splats = jax.jit(lambda: scene_splats(sc, base))()
    bg = jnp.asarray([0.3, 0.7], jnp.float32)
    a = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, base))(splats)
    assert int(a.n_overflow) == 0
    b = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, h2))(splats)
    c = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, h2f))(splats)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(c.color), np.asarray(b.color))
    assert float(a.occ.max()) > 0.5
    # h8: 8 rows x 128 cols per tile = the native (8,128) VPU tile 8-wide;
    # NPIX=1024 exercises the widest lane layout the kernel supports
    h8 = replace(PAL, tile_h=8, tile_capacity=1024)
    d = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, h8))(splats)
    np.testing.assert_allclose(np.asarray(d.color), np.asarray(a.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.depth), np.asarray(a.depth),
                               atol=1e-4)

    target = jax.random.uniform(jax.random.key(9), (2, 32, 256))

    def loss(means, cfg):
        s = preprocess_gaussians(means, sc.scales, sc.quats, sc.opacities,
                                 sc.feat, sc.mask, sc.w2s_rot, sc.w2s_trans,
                                 sc.beams, sc.W, cfg)
        o = render_tiled(s, sc.beams, sc.W, bg, cfg)
        return jnp.mean((o.color - target) ** 2) + 0.1 * jnp.mean(o.depth)

    g1 = jax.jit(jax.grad(lambda m: loss(m, base)))(sc.means3d)
    g2 = jax.jit(jax.grad(lambda m: loss(m, h2)))(sc.means3d)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-6)
