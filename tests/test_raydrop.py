"""Ray-drop refinement: frequency-MLP refiner (P13) + LiDAR4D UNet (P12)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidargs_tpu.models.raydrop import (
    apply_raydrop_mlp,
    apply_unet,
    frequency_encode,
    init_raydrop_mlp,
    init_unet,
    refine_raydrop,
    train_raydrop_refiner,
)


def test_frequency_encoding_shape_and_octaves():
    x = jnp.array([[0.5, -0.25, 1.0]])
    e = frequency_encode(x, degree=4)
    assert e.shape == (1, 3 * 4 * 2)
    # first octave is sin/cos(pi x)
    np.testing.assert_allclose(np.asarray(e[0, :3]), np.sin(np.pi * np.asarray(x[0])),
                               atol=1e-6)


def test_raydrop_mlp_output_range():
    params = init_raydrop_mlp(jax.random.key(0))
    n = 64
    d = jax.random.normal(jax.random.key(1), (n, 3))
    i = jax.random.uniform(jax.random.key(2), (n, 1))
    z = jax.random.uniform(jax.random.key(3), (n, 1), minval=0, maxval=80)
    p = apply_raydrop_mlp(params, d, i, z)
    assert p.shape == (n, 1)
    assert float(p.min()) >= 0.0 and float(p.max()) <= 1.0


def test_refiner_learns_depth_threshold_rule():
    """Synthetic rule: rays drop iff depth > 40. The refiner must learn it
    from (intensity, depth) inputs — the P13 offline training loop."""
    H, W = 8, 64
    rng = np.random.default_rng(0)
    rows, cols = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    az = -(cols - W / 2) / W * 2 * np.pi
    el = (rows - H / 2) / H * 0.4
    dirs = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], -1).reshape(-1, 3).astype(np.float32)
    N = 6
    depth = rng.uniform(0, 80, (N, H * W)).astype(np.float32)
    inten = rng.uniform(0, 1, (N, H * W)).astype(np.float32)
    gt = (depth > 40.0).astype(np.float32)
    params, hist = train_raydrop_refiner(
        jax.random.key(0), dirs, inten, depth / 80.0, gt, epochs=60, n_iters=400
    )
    assert hist[-1] < 0.05 and hist[-1] < hist[0] * 0.5
    # image-shaped wrapper agrees
    img = refine_raydrop(params, jnp.asarray(dirs.reshape(H, W, 3)),
                         jnp.asarray(inten[0].reshape(H, W)),
                         jnp.asarray(depth[0].reshape(H, W) / 80.0))
    acc = float(jnp.mean(((img > 0.5).astype(np.float32)
                          == gt[0].reshape(H, W)).astype(jnp.float32)))
    assert acc > 0.9


def test_unet_shapes_and_range():
    params = init_unet(jax.random.key(0), in_channels=3)
    x = jax.random.uniform(jax.random.key(1), (1, 3, 32, 64))
    y = jax.jit(apply_unet)(params, x)
    assert y.shape == (1, 1, 32, 64)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_unet_differentiable():
    params = init_unet(jax.random.key(0), in_channels=3, channels=8)
    x = jax.random.uniform(jax.random.key(1), (1, 3, 16, 32))
    tgt = jax.random.uniform(jax.random.key(2), (1, 1, 16, 32))

    def loss(p):
        return jnp.mean((apply_unet(p, x) - tgt) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    gs = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert np.isfinite(gs) and gs > 0


@pytest.mark.heavy  # UNet convergence run (35s); core keeps the MLP-refiner variant
def test_unet_refiner_learns_depth_threshold_rule():
    """The UNet refiner (cli refine --arch unet) on the same synthetic rule
    as the MLP test: drop iff depth > 40. Full-image training must learn it
    and beat the raw (noisy) raydrop input's MSE."""
    from lidargs_tpu.models.raydrop import refine_raydrop_unet, train_unet_refiner

    H, W = 16, 32
    rng = np.random.default_rng(1)
    N = 4
    depth = rng.uniform(0, 80, (N, H, W)).astype(np.float32)
    inten = rng.uniform(0, 1, (N, H, W)).astype(np.float32)
    gt = (depth > 40.0).astype(np.float32)
    noisy_rd = np.clip(gt + rng.normal(0, 0.4, gt.shape), 0, 1).astype(np.float32)
    params, hist = train_unet_refiner(
        jax.random.key(0), noisy_rd, inten, depth / 80.0, gt,
        epochs=150, n_iters=1000, channels=8,
    )
    assert hist[-1] < hist[0] * 0.5
    raw_mse = float(np.mean((noisy_rd[0] - gt[0]) ** 2))
    img = refine_raydrop_unet(
        params, jnp.asarray(noisy_rd[0]), jnp.asarray(inten[0]),
        jnp.asarray(depth[0] / 80.0)
    )
    assert img.shape == (H, W)
    refined_mse = float(jnp.mean((img - gt[0]) ** 2))
    assert refined_mse < raw_mse
