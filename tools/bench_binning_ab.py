"""A/B the binning instance budget + surfel/beam step timing at bench scale.
One TPU process, all variants batched."""
import time
import numpy as np
import jax, jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidargs_tpu.config import ModelConfig, RasterConfig, replace
from lidargs_tpu.lidar.beams import uniform_beam_inclinations
from lidargs_tpu.lidar.frames import LidarFrame
from lidargs_tpu.models.field import init_field_params, render_field

H, W = 64, 2650
N_ANCHORS = 60_000
mcfg = ModelConfig(anchor_capacity=65_536)
base_rcfg = RasterConfig(
    max_visible=2 ** 17, max_tiles_per_gaussian=16, tile_capacity=384, chunk=16,
)

rng = np.random.default_rng(0)
az = rng.uniform(-np.pi, np.pi, N_ANCHORS)
el = rng.uniform(np.radians(-20.0), np.radians(2.0), N_ANCHORS)
r = rng.uniform(4.0, 75.0, N_ANCHORS)
pts = np.stack([r*np.cos(el)*np.cos(az), r*np.cos(el)*np.sin(az), r*np.sin(el)], -1).astype(np.float32)

params = init_field_params(jax.random.key(0), mcfg)
params["anchor"] = params["anchor"].at[:N_ANCHORS].set(jnp.asarray(pts))
scale = np.log(np.clip(r * 0.004, 0.02, 0.5)).astype(np.float32)
params["scaling"] = params["scaling"].at[:N_ANCHORS].set(
    jnp.asarray(np.repeat(scale[:, None], 6, axis=1)))
params["feat"] = params["feat"].at[:N_ANCHORS].set(
    jax.random.normal(jax.random.key(1), (N_ANCHORS, mcfg.feat_dim)) * 0.3)
valid = jnp.arange(mcfg.anchor_capacity) < N_ANCHORS

beams = uniform_beam_inclinations(2.4, 20.9, H)
gt = np.zeros((3, H, W), np.float32)
frame = LidarFrame.from_lidar2world(np.eye(4), beams, gt, uid=0)
bg = jnp.zeros((2,), jnp.float32)

V = 2 ** 17
ref_out = None
for name, E in [("dense(-1)", -1), ("12V", 12 * V), ("11V", 11 * V), ("4V", 4 * V)]:
    rcfg = replace(base_rcfg, instance_capacity=E)
    fwd = jax.jit(lambda p, v, f: render_field(p, v, f, mcfg, rcfg, bg)[0])
    out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    for _ in range(5):
        out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    dt = (time.perf_counter() - t0) / n
    if ref_out is None:
        ref_out = out
        err = 0.0
    else:
        err = float(jnp.abs(out.color - ref_out.color).max())
    print(f"{name:10s}: {dt*1e3:6.2f} ms/frame  {1/dt:6.1f} FPS  "
          f"overflow={int(out.n_overflow)}  |dcolor|={err:.2e}")

# --- fused gather A/B (pallas windowed-DMA path) ---
for name, E, fused in [("12V+fused", 12 * V, True), ("dense+fused", -1, True), ("4V+fused", 4 * V, True)]:
    rcfg = replace(base_rcfg, instance_capacity=E, fused_gather=fused)
    fwd = jax.jit(lambda p, v, f: render_field(p, v, f, mcfg, rcfg, bg)[0])
    out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    for _ in range(5):
        out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    dt = (time.perf_counter() - t0) / n
    err = float(jnp.abs(out.color - ref_out.color).max())
    print(f"{name:10s}: {dt*1e3:6.2f} ms/frame  {1/dt:6.1f} FPS  "
          f"overflow={int(out.n_overflow)}  |dcolor|={err:.2e}")

# --- tile_h=2 variants (half the instances, 256-px tiles) ---
for name, th, K2, E, fused in [
    ("h2 K768", 2, 768, -1, False),
    ("h2 K768+f", 2, 768, -1, True),
    ("h2 K384", 2, 384, -1, False),
    ("h2 K384+f", 2, 384, -1, True),
]:
    rcfg = replace(base_rcfg, tile_h=th, tile_capacity=K2,
                   instance_capacity=E, fused_gather=fused)
    fwd = jax.jit(lambda p, v, f, rc=rcfg: render_field(p, v, f, mcfg, rc, bg)[0])
    out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    for _ in range(5):
        out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    dt = (time.perf_counter() - t0) / n
    err = float(jnp.abs(out.color - ref_out.color).max())
    print(f"{name:10s}: {dt*1e3:6.2f} ms/frame  {1/dt:6.1f} FPS  "
          f"overflow={int(out.n_overflow)}  |dcolor|={err:.2e}")

# --- pallas_chunk sweep (prefix-scan length vs early-exit granularity):
# the composite's ~9x gap to its VPU speed-of-light (tools/roofline.py) is
# partly the Hillis-Steele prefix over CH sublanes (log2(CH) shifted
# multiplies) + work past the transmittance crossing; smaller CH shortens
# both at the cost of more while_loop trips ---
for ch in (32, 64, 128, 192, 384):
    if base_rcfg.tile_capacity % ch:
        continue
    rcfg = replace(base_rcfg, backend="pallas", pallas_chunk=ch)
    fwd = jax.jit(lambda p, v, f, rc=rcfg: render_field(p, v, f, mcfg, rc, bg)[0])
    out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    for _ in range(5):
        out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, valid, frame)
    jax.block_until_ready(out.color)
    dt = (time.perf_counter() - t0) / n
    err = float(jnp.abs(out.color - ref_out.color).max())
    print(f"chunk {ch:4d}: {dt*1e3:6.2f} ms/frame  {1/dt:6.1f} FPS  "
          f"|dcolor|={err:.2e}")
