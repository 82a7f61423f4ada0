import time, numpy as np, jax, jax.numpy as jnp
from lidargs_tpu.config import ModelConfig, RasterConfig, replace
from lidargs_tpu.lidar.beams import uniform_beam_inclinations
from lidargs_tpu.lidar.frames import LidarFrame
from lidargs_tpu.models.field import init_field_from_points, render_field
H, W = 64, 2650
N = 60_000
mcfg = ModelConfig(anchor_capacity=65_536)
rng = np.random.default_rng(0)
az = rng.uniform(-np.pi, np.pi, N); el = rng.uniform(np.radians(-20.), np.radians(2.), N)
r = rng.uniform(4., 75., N)
pts = np.stack([r*np.cos(el)*np.cos(az), r*np.cos(el)*np.sin(az), r*np.sin(el)], -1).astype(np.float32)
beams = uniform_beam_inclinations(2.0, 22.0, H)
gt = np.zeros((3,H,W), np.float32)
frame = LidarFrame.from_lidar2world(np.eye(4), beams, gt, uid=0)
import jax.random as jr
field = init_field_from_points(jr.key(0), mcfg, pts, voxel_size=0.5)
bg = jnp.zeros((2,), jnp.float32)

def timeit(f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1000

for ch in (16, 32, 64, 128):
    rcfg = RasterConfig(max_visible=2**18, max_tiles_per_gaussian=16,
                        tile_capacity=384, chunk=16, pallas_chunk=ch)
    f = jax.jit(lambda p, v, fr: render_field(p, v, fr, mcfg, rcfg, bg)[0].color)
    t = timeit(f, field.params, field.valid, frame)
    g = jax.jit(jax.value_and_grad(lambda p, v, fr: jnp.mean(render_field(p, v, fr, mcfg, rcfg, bg)[0].color**2)))
    tg = timeit(g, field.params, field.valid, frame, n=10)
    print(f"pallas_chunk={ch}: full fwd {t:.2f} ms, fwd+bwd {tg:.2f} ms")
