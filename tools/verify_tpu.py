"""End-to-end TPU drive: render + golden parity + grads + probes + a short
training loop, on the REAL chip (the CPU test suite cannot catch
tunnel/Mosaic/precision issues). Run from the repo root:

    PYTHONPATH=. python tools/verify_tpu.py

Expected output ends with ALL DRIVE CHECKS PASSED / SURFEL DRIVE PASSED.
See .claude/skills/verify/SKILL.md for the gotchas (exclusive tunnel!).
"""
import jax, jax.numpy as jnp, numpy as np
from lidargs_tpu.config import RasterConfig, replace
from lidargs_tpu.ops import preprocess_gaussians, render_reference, render_tiled
from lidargs_tpu.utils.testing import make_scene, scene_splats

CFG = RasterConfig(max_visible=512, max_tiles_per_gaussian=64, tile_capacity=256,
                   chunk=8, pallas_chunk=8)   # backend=auto -> pallas on TPU
sc = make_scene(jax.random.key(0), n=200, H=32, W=256)
bg = jnp.asarray([0.3, 0.7], jnp.float32)
splats = jax.jit(lambda: scene_splats(sc, CFG))()
out = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, CFG))(splats)
ref = jax.jit(lambda s: render_reference(s, sc.beams, sc.W, bg, CFG))(splats)
err_c = float(jnp.abs(out.color - ref[0]).max())
err_d = float(jnp.abs(out.depth - ref[1]).max())
print(f"occ mean {float(out.occ.mean()):.3f} max {float(out.occ.max()):.3f} "
      f"visible {int(out.visible.sum())} dropped {int(out.n_dropped)} overflow {int(out.n_overflow)}")
print(f"tiled-vs-golden: |color| {err_c:.2e} |depth| {err_d:.2e}")
assert int(out.n_dropped) == 0 and int(out.n_overflow) == 0
assert err_c < 1e-2 and err_d < 1e-1 and float(out.occ.max()) > 0.5

# grad through the full pipeline (pallas custom VJP on TPU)
def loss(means, scales, opac, feat):
    s = preprocess_gaussians(means, scales, sc.quats, opac, feat, sc.mask,
                             sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, CFG)
    o = render_tiled(s, sc.beams, sc.W, bg, CFG)
    return jnp.mean(o.color**2) + 0.1*jnp.mean(o.depth) + 0.05*jnp.mean(o.occ)
g = jax.jit(jax.grad(loss, argnums=(0,1,2,3)))(sc.means3d, sc.scales, sc.opacities, sc.feat)
for x in g:
    assert bool(jnp.isfinite(x).all()), "non-finite grad"
gs = sum(float(jnp.abs(x).sum()) for x in g)
print(f"grads finite, sum|g| {gs:.3e}")
assert gs > 0

# probe: empty scene
sc0 = make_scene(jax.random.key(1), n=8, H=16, W=128)
far = sc0.means3d * 0 + jnp.array([500., 0., 0.])
s0 = jax.jit(lambda: preprocess_gaussians(far, sc0.scales, sc0.quats, sc0.opacities,
        sc0.feat, sc0.mask, sc0.w2s_rot, sc0.w2s_trans, sc0.beams, sc0.W, CFG))()
o0 = jax.jit(lambda s: render_tiled(s, sc0.beams, sc0.W, bg, CFG))(s0)
assert float(o0.occ.max()) == 0.0, "empty scene must be transparent"
print("empty scene: occ == 0 OK")

# probe: pathological capacity -> finite output + overflow counter
CFG2 = replace(CFG, tile_capacity=8, max_tiles_per_gaussian=4, pallas_chunk=8)
sc2 = make_scene(jax.random.key(2), n=400, H=16, W=128)
s2 = jax.jit(lambda: scene_splats(sc2, CFG2))()
o2 = jax.jit(lambda s: render_tiled(s, sc2.beams, sc2.W, bg, CFG2))(s2)
assert bool(jnp.isfinite(o2.color).all()) and bool(jnp.isfinite(o2.depth).all())
print(f"tiny-capacity: finite output, overflow={int(o2.n_overflow)}")

# training stack: few steps on synthetic scene, loss must decrease
import functools
from lidargs_tpu.train.trainer import init_train_state, train_step
from lidargs_tpu.models.field import init_field_from_points
from lidargs_tpu.config import ModelConfig, OptConfig
from lidargs_tpu.lidar.beams import uniform_beam_inclinations
from lidargs_tpu.lidar.frames import LidarFrame
mcfg = ModelConfig(feat_dim=8, n_offsets=2, mlp_hidden=8, anchor_capacity=4096)
rcfg = RasterConfig(max_visible=4096, max_tiles_per_gaussian=8, tile_capacity=64,
                    chunk=8, pallas_chunk=8)
H, W = 16, 256
rng = np.random.default_rng(0)
az = rng.uniform(-np.pi, np.pi, 1500); el = rng.uniform(-0.3, 0.1, 1500)
r = rng.uniform(5., 50., 1500)
pts = np.stack([r*np.cos(el)*np.cos(az), r*np.cos(el)*np.sin(az), r*np.sin(el)], -1)
beams = uniform_beam_inclinations(6.0, 24.0, H)
gt = np.zeros((3,H,W), np.float32)
gt[0] = 1.0; gt[1] = 0.5; gt[2] = 20.0
frame = LidarFrame.from_lidar2world(np.eye(4), beams, gt, uid=0)
ocfg = OptConfig(start_stat=10**9)
field = init_field_from_points(jax.random.key(0), mcfg, pts, voxel_size=2.0)
state = init_train_state(field, mcfg)
step = jax.jit(functools.partial(train_step, bg=jnp.zeros((2,), jnp.float32),
                                 mcfg=mcfg, rcfg=rcfg, ocfg=ocfg))
losses = []
for i in range(8):
    state, m = step(state, frame)
    losses.append(float(m.loss.total))
print("losses:", " ".join(f"{l:.4f}" for l in losses))
assert losses[-1] < losses[0], "loss did not decrease"
print("ALL DRIVE CHECKS PASSED")

# --- surfel variant on TPU ---
from lidargs_tpu.ops.surfel import preprocess_surfels, render_surfels
sc3 = make_scene(jax.random.key(9), n=150, H=32, W=256)
import jax.random as jrr
scales2 = jrr.uniform(jax.random.key(10), (150, 2), minval=0.3, maxval=1.2)
pk = jax.jit(lambda: preprocess_surfels(sc3.means3d, scales2, sc3.quats, sc3.opacities,
        sc3.feat, sc3.mask, sc3.w2s_rot, sc3.w2s_trans, sc3.beams, sc3.W, CFG))()
gsrf = jax.jit(lambda p: render_surfels(p, sc3.beams, sc3.W, bg, CFG, golden=True))(pk)
tsrf = jax.jit(lambda p: render_surfels(p, sc3.beams, sc3.W, bg, CFG))(pk)
es = float(jnp.abs(tsrf.color - gsrf.color).max())
ed = float(jnp.abs(tsrf.depth - gsrf.depth).max())
print(f"surfel tiled-vs-golden: |color| {es:.2e} |depth| {ed:.2e} occ.max {float(tsrf.occ.max()):.3f}")
assert es < 1e-4 and ed < 1e-3 and float(tsrf.occ.max()) > 0.5
def sloss(means, s2):
    p = preprocess_surfels(means, s2, sc3.quats, sc3.opacities, sc3.feat, sc3.mask,
                           sc3.w2s_rot, sc3.w2s_trans, sc3.beams, sc3.W, CFG)
    o = render_surfels(p, sc3.beams, sc3.W, bg, CFG)
    return jnp.mean(o.color**2) + 0.01*jnp.mean(o.distortion) + 0.1*jnp.mean(o.depth)
gg = jax.jit(jax.grad(sloss, argnums=(0,1)))(sc3.means3d, scales2)
assert all(bool(jnp.isfinite(x).all()) for x in gg)
print("surfel grads finite OK")
print("SURFEL DRIVE PASSED")

# --- round-2 paths: fused-gather kernels + hand-derived surfel backward ---
CFGF = replace(CFG, fused_gather=True, instance_capacity=200 * 64)
outf = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, CFGF))(splats)
ef = float(jnp.abs(outf.color - out.color).max())
assert ef == 0.0, f"fused-gather render != materialized: {ef:.2e}"
gf = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
    sc.means3d, sc.scales, sc.opacities, sc.feat)
# loss closes over CFG; rebuild against CFGF for the fused grads
def loss_f(means, scales, opac, feat):
    s = preprocess_gaussians(means, scales, sc.quats, opac, feat, sc.mask,
                             sc.w2s_rot, sc.w2s_trans, sc.beams, sc.W, CFGF)
    o = render_tiled(s, sc.beams, sc.W, bg, CFGF)
    return jnp.mean(o.color**2) + 0.1*jnp.mean(o.depth) + 0.05*jnp.mean(o.occ)
gf2 = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3)))(
    sc.means3d, sc.scales, sc.opacities, sc.feat)
for a, b in zip(g, gf2):
    rel = float(jnp.abs(a - b).max()) / max(float(jnp.abs(a).max()), 1e-12)
    assert rel < 1e-4, f"fused grads diverge rel {rel:.2e}"
print("fused-gather: forward bitwise, grads match — OK")

# surfel: fused forward bitwise + hand-bwd grads finite/nonzero on chip
CFGSF = replace(CFGF, tile_capacity=256, pallas_chunk=8)
tsf = jax.jit(lambda p: render_surfels(p, sc3.beams, sc3.W, bg, CFGSF))(pk)
es2 = float(jnp.abs(tsf.color - tsrf.color).max())
assert es2 < 1e-6, f"surfel fused != materialized: {es2:.2e}"
def sloss_f(means, s2):
    p = preprocess_surfels(means, s2, sc3.quats, sc3.opacities, sc3.feat, sc3.mask,
                           sc3.w2s_rot, sc3.w2s_trans, sc3.beams, sc3.W, CFGSF)
    o = render_surfels(p, sc3.beams, sc3.W, bg, CFGSF)
    return (jnp.mean(o.color**2) + 0.01*jnp.mean(o.distortion)
            + 0.1*jnp.mean(o.depth) + 0.01*jnp.mean(o.normal**2))
ggf = jax.jit(jax.grad(sloss_f, argnums=(0, 1)))(sc3.means3d, scales2)
for a, b in zip(gg, ggf):
    rel = float(jnp.abs(a - b).max()) / max(float(jnp.abs(a).max()), 1e-12)
    assert rel < 5e-3, f"surfel fused/hand-bwd grads diverge rel {rel:.2e}"
print("surfel fused + hand backward on chip — OK")
print("ROUND-2 DRIVE PASSED")

# --- round-3: post-densify maintenance clamp + tile_h=2 NPIX path ---
from lidargs_tpu.config import ModelConfig, OptConfig
from lidargs_tpu.models.field import init_field_from_points
from lidargs_tpu.train.trainer import Trainer, init_train_state

import numpy as _np
_mc = ModelConfig(feat_dim=16, n_offsets=4, mlp_hidden=16, anchor_capacity=4096)
_rng = _np.random.default_rng(0)
_pts = _rng.uniform(-30, 30, (3000, 3))
_field = init_field_from_points(jax.random.key(0), _mc, _pts, voxel_size=2.0)
_tr = Trainer(mcfg=_mc, ocfg=OptConfig(), rcfg=CFG, bg=bg)
_st = init_train_state(_field, _mc)
_p = dict(_st.params)
_p["scaling"] = _p["scaling"].at[:, 3:].set(2.5)
_st = _st._replace(params=_p)
_st2 = _tr.maintain(_st)
assert float(_st2.params["scaling"][:, 3:].max()) <= 0.05 + 1e-7
print("maintain clamp on chip — OK")

CFGH2 = replace(CFG, tile_h=2, tile_capacity=128)
outh2 = jax.jit(lambda s: render_tiled(s, sc.beams, sc.W, bg, CFGH2))(splats)
assert bool(jnp.isfinite(outh2.color).all())
d_h2 = float(jnp.abs(outh2.color - out.color).max())
print(f"tile_h=2 render on chip: finite, |dcolor| vs h1 {d_h2:.2e} "
      "(capacity-order differences expected)")
print("ROUND-3 DRIVE PASSED")
