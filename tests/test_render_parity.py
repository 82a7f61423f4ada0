"""Projection + renderer tests: golden vs tiled parity, gradients, semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidargs_tpu.config import RasterConfig, replace
from lidargs_tpu.ops import preprocess_gaussians, render_reference, render_tiled
from lidargs_tpu.utils.testing import make_scene, scene_splats

CFG = RasterConfig(max_visible=512, max_tiles_per_gaussian=64, tile_capacity=256, chunk=8)


def _render_both(key, n=200, H=32, W=256, cfg=CFG):
    sc = make_scene(key, n=n, H=H, W=W)
    splats = jax.jit(lambda: scene_splats(sc, cfg))()
    bg = jnp.zeros((2,), jnp.float32)
    ref = jax.jit(lambda s: render_reference(s, sc.beams, sc.W, bg, cfg))(splats)
    out = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, cfg))(splats)
    return sc, splats, ref, out


def test_preprocess_culls_far_and_marks_valid():
    sc = make_scene(jax.random.key(0), n=64, H=16, W=128)
    far = sc.means3d.at[:8].set(jnp.array([200.0, 0.0, 0.0]))
    splats = preprocess_gaussians(
        far, sc.scales, sc.quats, sc.opacities, sc.feat, sc.mask,
        sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, CFG,
    )
    assert not bool(splats.valid[:8].any())
    assert bool(splats.valid[8:].sum() > 40)
    # depth is euclidean range
    d = jnp.linalg.norm(far, axis=-1)
    np.testing.assert_allclose(
        np.asarray(splats.depth[splats.valid]), np.asarray(d[splats.valid]), rtol=1e-5
    )


def test_projection_center_maps_to_expected_pixel():
    """A gaussian dead-center on a beam ray must land on that pixel."""
    H, W = 16, 128
    sc = make_scene(jax.random.key(1), n=1, H=H, W=W)
    beams = sc.beams
    row, col = 5, 37
    alpha = beams[H - 1 - row]
    beta = -(col - W / 2.0) / W * 2.0 * jnp.pi
    r = 20.0
    mean = r * jnp.stack(
        [jnp.cos(alpha) * jnp.cos(beta), jnp.cos(alpha) * jnp.sin(beta), jnp.sin(alpha)]
    )
    splats = preprocess_gaussians(
        mean[None], sc.scales[:1], sc.quats[:1], sc.opacities[:1], sc.feat[:1],
        sc.mask[:1], sc.w2s_rot, sc.w2s_trans, beams, W, CFG,
    )
    assert bool(splats.valid[0])
    np.testing.assert_allclose(float(splats.center[0, 0]), col, atol=1e-2)
    np.testing.assert_allclose(float(splats.center[0, 1]), row, atol=1e-2)


def test_tiled_matches_golden_forward():
    _, _, ref, out = _render_both(jax.random.key(2))
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref[0]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref[1]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.occ), np.asarray(ref[2]), atol=2e-6)
    assert float(out.n_dropped) == 0
    assert float(out.n_overflow) == 0
    # scene actually renders something
    assert float(out.occ.max()) > 0.5


def test_tiled_matches_golden_under_heavy_overlap():
    cfg = replace(CFG, tile_capacity=512)
    _, _, ref, out = _render_both(jax.random.key(3), n=400, H=16, W=128, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref[0]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref[1]), atol=2e-5)


def test_gradients_match_golden():
    sc = make_scene(jax.random.key(4), n=120, H=16, W=128)
    bg = jnp.zeros((2,), jnp.float32)
    target = jax.random.uniform(jax.random.key(5), (2, 16, 128))

    def loss_with(render_fn):
        def f(means, scales, opac, feat):
            splats = preprocess_gaussians(
                means, scales, sc.quats, opac, feat, sc.mask,
                sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, CFG,
            )
            if render_fn is render_reference:
                color, depth, occ, _ = render_fn(splats, sc.beams, sc.W, bg, CFG)
            else:
                o = render_fn(splats, sc.beams, sc.W, bg, CFG)
                color, depth = o.color, o.depth
            return jnp.mean((color - target) ** 2) + 0.1 * jnp.mean(depth)
        return f

    args = (sc.means3d, sc.scales, sc.opacities, sc.feat)
    g_ref = jax.jit(jax.grad(loss_with(render_reference), argnums=(0, 1, 2, 3)))(*args)
    g_out = jax.jit(jax.grad(loss_with(render_tiled), argnums=(0, 1, 2, 3)))(*args)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)
    assert float(sum(jnp.abs(g).sum() for g in g_ref)) > 0.0


def test_front_to_back_occlusion():
    """An opaque near gaussian must hide a far one on the same ray."""
    H, W = 16, 128
    sc = make_scene(jax.random.key(6), n=2, H=H, W=W)
    ray = jnp.array([1.0, 0.0, 0.0])
    means = jnp.stack([ray * 10.0, ray * 40.0])
    feat = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    opac = jnp.array([3.0, 1.0])  # alpha clamps at 0.99
    scales = jnp.full((2, 3), 0.8)
    @jax.jit
    def go():
        splats = preprocess_gaussians(
            means, scales, sc.quats[:2], opac, feat, sc.mask[:2],
            sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, CFG,
        )
        return render_tiled(splats, sc.beams, sc.W, jnp.zeros((2,)), CFG)

    out = go()
    # center pixel of the +x ray: beta=0 -> col W/2
    col = W // 2
    row = int(jnp.argmin(jnp.abs(sc.beams[::-1] - 0.0)))
    assert float(out.color[0, row, col]) > 0.9     # near intensity visible
    assert float(out.color[1, row, col]) < 0.05    # far channel occluded
    assert float(out.depth[row, col]) == pytest.approx(10.0 * 0.99, rel=0.05)


def test_tile_capacity_overflow_drops_farthest_only():
    cfg = replace(CFG, tile_capacity=4, max_tiles_per_gaussian=16)
    sc = make_scene(jax.random.key(7), n=300, H=8, W=128)
    out = jax.jit(
        lambda: render_tiled(scene_splats(sc, cfg), sc.beams, sc.W, jnp.zeros((2,)), cfg)
    )()
    assert float(out.n_overflow) > 0
    assert np.isfinite(np.asarray(out.color)).all()


def test_jit_and_batch_vmap():
    sc = make_scene(jax.random.key(8), n=64, H=16, W=128)
    bg = jnp.zeros((2,), jnp.float32)

    @jax.jit
    def go(means):
        splats = preprocess_gaussians(
            means, sc.scales, sc.quats, sc.opacities, sc.feat, sc.mask,
            sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, CFG,
        )
        return render_tiled(splats, sc.beams, sc.W, bg, CFG).color

    single = go(sc.means3d)
    batched = jax.vmap(go)(jnp.stack([sc.means3d, sc.means3d + 0.1]))
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single), atol=1e-6)


def test_rank_search_binning_matches_dense_grid():
    """The rank-search instance emission (instance_capacity budget,
    rasterize.py bin_instances) must produce the identical per-tile id
    lists as the legacy dense [V, cap] grid when the budget covers every
    instance, and count (not corrupt) drops when it doesn't."""
    from lidargs_tpu.ops.projection import PackedCols, pack_splats
    from lidargs_tpu.ops.rasterize import bin_instances

    sc = make_scene(jax.random.key(3), n=300, H=32, W=256)
    cfg_d = replace(CFG, instance_capacity=-1)
    splats = jax.jit(lambda: scene_splats(sc, cfg_d))()
    pk = pack_splats(splats)
    C = 2
    gy, gx = cfg_d.grid_shape(32, 256)
    rect = pk[:, PackedCols.rect(C)].astype(jnp.int32)
    center = pk[:, PackedCols.center(C)]
    vvalid = pk[:, PackedCols.validf(C)] > 0.0

    ids_d, counts_d, ovf_d = jax.jit(
        lambda r, c, v: bin_instances(r, c, v, cfg_d, gx, gy)
    )(rect, center, vvalid)
    # ample budget -> identical lists
    cfg_r = replace(CFG, instance_capacity=300 * 64)
    ids_r, counts_r, ovf_r = jax.jit(
        lambda r, c, v: bin_instances(r, c, v, cfg_r, gx, gy)
    )(rect, center, vvalid)
    np.testing.assert_array_equal(np.asarray(counts_r), np.asarray(counts_d))
    np.testing.assert_array_equal(np.asarray(ids_r), np.asarray(ids_d))
    assert int(ovf_r) == int(ovf_d)

    # tight budget -> only the deepest gaussians' instances drop, and the
    # loss is counted
    n_inst = int(jnp.sum(counts_d))
    tight = max(n_inst - 64, 1)
    cfg_t = replace(CFG, instance_capacity=tight)
    ids_t, counts_t, ovf_t = jax.jit(
        lambda r, c, v: bin_instances(r, c, v, cfg_t, gx, gy)
    )(rect, center, vvalid)
    assert int(ovf_t) > int(ovf_d)
    # surviving per-tile prefixes agree (drops only at the depth tail)
    ct, cd = np.asarray(counts_t), np.asarray(counts_d)
    it, idd = np.asarray(ids_t), np.asarray(ids_d)
    assert (ct <= cd).all()
    for t in range(len(ct)):
        np.testing.assert_array_equal(it[t, :ct[t]], idd[t, :ct[t]])


def test_render_tiled_budget_matches_dense_at_scale():
    """Full render through a generous explicit instance budget (rank-search
    emission engaged) vs the exact dense grid: identical images and
    identical overflow when the budget covers every instance; a starving
    budget drops farthest-only, counts it, and stays finite."""
    cfg_dense = replace(CFG, max_visible=4096, instance_capacity=-1,
                        max_tiles_per_gaussian=32)
    sc = make_scene(jax.random.key(11), n=4096, H=32, W=512)
    splats = jax.jit(lambda: scene_splats(sc, cfg_dense))()
    bg = jnp.zeros((2,), jnp.float32)
    d = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, cfg_dense))(splats)

    cfg_budget = replace(cfg_dense, instance_capacity=4096 * 32)  # full cover
    a = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, cfg_budget))(splats)
    assert int(a.n_overflow) == int(d.n_overflow)
    np.testing.assert_array_equal(np.asarray(a.color), np.asarray(d.color))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(d.depth))

    cfg_tight = replace(cfg_dense, instance_capacity=8192)        # starved
    t = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, cfg_tight))(splats)
    assert int(t.n_overflow) > int(d.n_overflow)
    assert bool(jnp.isfinite(t.color).all())


def test_permutation_rows_vjp_matches_take():
    """The gather-based VJP of the cull row-take must equal XLA's
    scatter-add transpose exactly (sel is a permutation, so the transpose
    IS a permutation-gather), including V < P truncation."""
    import jax

    from lidargs_tpu.ops.rasterize import permutation_rows

    key = jax.random.key(11)
    P, F, V = 97, 5, 60
    pk = jax.random.normal(key, (P, F))
    sel = jax.random.permutation(jax.random.key(12), P).astype(jnp.int32)
    ct = jax.random.normal(jax.random.key(13), (V, F))

    def via_take(pk):
        return jnp.sum(jnp.take(pk, sel[:V], axis=0, mode="clip") * ct)

    def via_perm(pk):
        return jnp.sum(permutation_rows(pk, sel, V) * ct)

    f1 = jax.jit(via_take)(pk)
    f2 = jax.jit(via_perm)(pk)
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(f1))
    g1 = jax.jit(jax.grad(via_take))(pk)
    g2 = jax.jit(jax.grad(via_perm))(pk)
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g1))
