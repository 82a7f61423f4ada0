"""Hand-derived projection VJP vs autodiff (preprocess_gaussians_hv).

The custom VJP recomputes the forward inside one fused backward pass
instead of storing ~20 narrow residual arrays (DESIGN §13). It must be
EXACT against XLA autodiff for every input cotangent — including rows
that are masked, degenerate (vertical rays), near/far-culled, or
det-culled — and for the frame pose (w2s_rot, w2s_trans). `beams` is the
one documented exception (zero cotangent: fixed sensor calibration).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidargs_tpu.config import RasterConfig
from lidargs_tpu.ops.projection import (
    Splats,
    preprocess_gaussians,
    preprocess_gaussians_hv,
)

RCFG = RasterConfig(max_visible=2048, tile_capacity=64, chunk=8)
H, W = 16, 256


def _scene(n=257, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    # exercise every cull branch: masked rows, near rows, far rows, a
    # degenerate vertical ray, and the origin
    pts[3] = [0.0, 0.0, 25.0]      # degenerate (vertical): horiz2 == 0
    pts[4] = [0.0, 0.0, 0.0]       # coincides with sensor: sq == 0
    pts[5] = [500.0, 1.0, 0.0]     # far-culled
    pts[6] = [1e-3, 0.0, 0.0]      # near-ish
    scales = np.exp(rng.uniform(-3, 0, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0, 1, n).astype(np.float32)
    feat = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[7:9] = False
    beams = np.linspace(np.radians(-25.0), np.radians(3.0), H).astype(
        np.float32)
    th = 0.3
    w2s_rot = np.array(
        [[np.cos(th), -np.sin(th), 0.0],
         [np.sin(th), np.cos(th), 0.0],
         [0.0, 0.0, 1.0]], np.float32)
    w2s_trans = np.array([0.5, -0.2, 0.1], np.float32)
    return tuple(map(jnp.asarray,
                     (pts, scales, q, opac, feat, mask, w2s_rot, w2s_trans,
                      beams)))


def _cotangents(out: Splats, seed=1):
    rng = np.random.default_rng(seed)
    g = lambda x: jnp.asarray(
        rng.normal(size=x.shape).astype(np.float32))
    # float cotangents for the differentiable outputs; zeros (float0 is
    # what JAX itself would pass) handled via the None/zero path
    return Splats(
        valid=None, depth=g(out.depth), sphere_mean=g(out.sphere_mean),
        u1=g(out.u1), u2=g(out.u2), conic=g(out.conic),
        opacity=g(out.opacity), feat=g(out.feat), center=g(out.center),
        radii_xy=None, pix_rect=None,
    )


def _vjp_inputs(fn, args, ct):
    """(g_means, g_scales, g_quats, g_opac, g_feat, g_rot, g_trans)"""
    diff = (0, 1, 2, 3, 4, 6, 7)

    def f(*d):
        a = list(args)
        for i, v in zip(diff, d):
            a[i] = v
        out = fn(*a, W, RCFG)
        # contract float outputs with the fixed cotangents (same scalar
        # for both implementations -> identical input cotangents)
        tot = 0.0
        for name in ("depth", "sphere_mean", "u1", "u2", "conic",
                     "opacity", "feat", "center"):
            tot = tot + jnp.vdot(getattr(out, name), getattr(ct, name))
        return tot

    return jax.grad(f, argnums=tuple(range(len(diff))))(
        *[args[i] for i in diff])


@pytest.mark.parametrize("seed", [0, 3])
def test_hand_vjp_matches_autodiff(seed):
    args = _scene(seed=seed)
    out = preprocess_gaussians(*args, W, RCFG)
    out_hv = preprocess_gaussians_hv(*args, W, RCFG)
    # forward identical (same function)
    for a, b in zip(out, out_hv):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ct = _cotangents(out, seed=seed + 10)
    g_ref = _vjp_inputs(preprocess_gaussians, args, ct)
    g_hv = _vjp_inputs(preprocess_gaussians_hv, args, ct)
    names = ("means", "scales", "quats", "opacities", "feat",
             "w2s_rot", "w2s_trans")
    # f32: different accumulation order -> last-ulp reassociation only
    # (observed worst case 2.7e-5 relative on 1/771 elements); the f64
    # test below pins the math itself to 1e-12
    for nm, a, b in zip(names, g_hv, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"cotangent mismatch for {nm}")


def test_hand_vjp_matches_autodiff_f64():
    """Float64 comparison: the hand-derived math must agree with autodiff
    to solver precision, proving the f32 deltas are pure reassociation."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        args = tuple(
            a.astype(jnp.float64) if a.dtype == jnp.float32 else a
            for a in _scene(seed=2))
        out = preprocess_gaussians(*args, W, RCFG)
        ct = _cotangents(out, seed=20)
        ct = Splats(*[None if c is None else c.astype(jnp.float64)
                      for c in ct])
        g_ref = _vjp_inputs(preprocess_gaussians, args, ct)
        g_hv = _vjp_inputs(preprocess_gaussians_hv, args, ct)
        for a, b in zip(g_hv, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", old)


def test_hand_vjp_partial_cotangents():
    """Only some outputs used (the render uses conic/center/depth/... but a
    caller may reduce fewer) — missing cotangents must behave as zeros."""
    args = _scene(seed=5)

    def f(fn):
        def g(m, s):
            a = list(args)
            a[0], a[1] = m, s
            out = fn(*a, W, RCFG)
            return jnp.sum(out.conic) + jnp.sum(out.center * 0.25)
        return jax.grad(g, argnums=(0, 1))(args[0], args[1])

    g_ref = f(preprocess_gaussians)
    g_hv = f(preprocess_gaussians_hv)
    for a, b in zip(g_hv, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
