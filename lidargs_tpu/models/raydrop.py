"""Ray-drop refinement models + offline refinement trainer.

TPU-native re-design of two reference components:

* P12 — LiDAR4D's efficient UNet (`scene/unet.py:139-171`): 1x1 in-conv to
  32 channels, 4x (maxpool + double conv) down to 256, a multi-head
  attention block, 4x (bilinear up + skip-concat + double conv), sigmoid
  1x1 out-conv. The reference imports it into GaussianModel but its
  training hooks are commented out (`gaussian_model.py:164-167,344-347`);
  it is provided here as a first-class, trainable refiner.
* P13 — the standalone refiner (`scene/extre_train_raydrop.py:28-117`):
  tiny-cuda-nn Frequency encodings of the ray direction (degree 4) and of
  (intensity, depth) (degree 6) feeding a FullyFusedMLP(128x4, ReLU,
  sigmoid out), trained with MSE on dumped per-frame renders with Adam
  lr 5e-4 and 0.1^(step/10000) exponential decay
  (`extre_train_raydrop.py:120-160`).

Everything is explicit param pytrees (models/mlp.py style). Convolutions
use NCHW `lax.conv_general_dilated` — XLA maps them onto the MXU.
BatchNorm uses current-batch statistics (the reference only ever runs the
UNet in train mode, where torch BN does exactly that).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import init_linear


# ---------------------------------------------------------------------------
# frequency-encoding MLP refiner (P13)
# ---------------------------------------------------------------------------

def frequency_encode(x: jnp.ndarray, degree: int) -> jnp.ndarray:
    """tiny-cuda-nn 'Frequency' encoding: per input dim, degree octaves of
    (sin, cos) of 2^k * pi * x (`extre_train_raydrop.py:31-50`)."""
    feats = []
    for k in range(degree):
        s = (2.0 ** k) * jnp.pi * x
        feats.append(jnp.sin(s))
        feats.append(jnp.cos(s))
    return jnp.concatenate(feats, axis=-1)


def init_raydrop_mlp(key, dir_degree: int = 4, id_degree: int = 6,
                     width: int = 128, depth: int = 4) -> dict:
    d_in = 3 * dir_degree * 2 + 2 * id_degree * 2
    keys = jax.random.split(key, depth + 1)
    layers = [init_linear(keys[0], d_in, width)]
    for i in range(1, depth):
        layers.append(init_linear(keys[i], width, width))
    layers.append(init_linear(keys[depth], width, 1))
    return {
        "layers": layers,
        "dir_degree": dir_degree,
        "id_degree": id_degree,
    }


def apply_raydrop_mlp(params: dict, ray_dir: jnp.ndarray,
                      intensity: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """[N,3] dirs + [N,1] intensity + [N,1] depth -> [N,1] raydrop prob."""
    enc = jnp.concatenate(
        [
            frequency_encode(ray_dir, params["dir_degree"]),
            frequency_encode(
                jnp.concatenate([intensity, depth], axis=-1), params["id_degree"]
            ),
        ],
        axis=-1,
    )
    h = enc
    layers = params["layers"]
    for lin in layers[:-1]:
        h = jax.nn.relu(h @ lin["w"] + lin["b"])
    out = h @ layers[-1]["w"] + layers[-1]["b"]
    return jax.nn.sigmoid(out)


def refine_raydrop(params: dict, ray_dir_hw3: jnp.ndarray,
                   intensity_hw: jnp.ndarray, depth_hw: jnp.ndarray) -> jnp.ndarray:
    """Image-shaped convenience wrapper: [H,W,3], [H,W], [H,W] -> [H,W]."""
    H, W = intensity_hw.shape
    p = apply_raydrop_mlp(
        params,
        ray_dir_hw3.reshape(-1, 3),
        intensity_hw.reshape(-1, 1),
        depth_hw.reshape(-1, 1),
    )
    return p.reshape(H, W)


def train_raydrop_refiner(
    key,
    ray_dirs: np.ndarray,          # [H*W, 3] shared across frames (dir.npy)
    intensity: np.ndarray,         # [N, H*W] rendered intensity per frame
    depth: np.ndarray,             # [N, H*W] rendered depth per frame
    gt_raydrop: np.ndarray,        # [N, H*W] ground-truth raydrop mask
    epochs: int = 100,
    lr: float = 5e-4,
    decay_rate: float = 0.1,
    n_iters: int = 10_000,
    val_split: Tuple[np.ndarray, ...] = None,
    log_every: int = 0,
):
    """Offline refinement loop (extre_train_raydrop.py:117-190): one Adam
    step per frame per epoch, MSE loss, lr = lr0 * decay^(step/n_iters).
    Returns (params, history)."""
    import optax

    params = init_raydrop_mlp(key)
    static = {k: params[k] for k in ("dir_degree", "id_degree")}

    sched = lambda step: lr * decay_rate ** (step / n_iters)
    opt = optax.adam(learning_rate=sched, b1=0.9, b2=0.999)
    opt_state = opt.init(params["layers"])

    dirs = jnp.asarray(ray_dirs, jnp.float32)

    @jax.jit
    def step(layers, opt_state, inten, dep, gt):
        def loss_fn(layers):
            p = apply_raydrop_mlp({**static, "layers": layers}, dirs,
                                  inten[:, None], dep[:, None])
            return jnp.mean((p[:, 0] - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(layers)
        updates, opt_state = opt.update(grads, opt_state)
        layers = optax.apply_updates(layers, updates)
        return layers, opt_state, loss

    layers = params["layers"]
    history = []
    n = intensity.shape[0]
    it = 0
    for epoch in range(epochs):
        for i in range(n):
            layers, opt_state, loss = step(
                layers, opt_state,
                jnp.asarray(intensity[i], jnp.float32),
                jnp.asarray(depth[i], jnp.float32),
                jnp.asarray(gt_raydrop[i], jnp.float32),
            )
            it += 1
        history.append(float(loss))
        if log_every and (epoch + 1) % log_every == 0:
            print(f"[raydrop] epoch {epoch + 1}: loss {float(loss):.6f}")
    return {**static, "layers": layers}, history


# ---------------------------------------------------------------------------
# LiDAR4D efficient UNet (P12)
# ---------------------------------------------------------------------------

def _init_conv(key, c_in: int, c_out: int, k: int, bias: bool = True) -> dict:
    """torch Conv2d default init (kaiming-uniform a=sqrt(5) == U(+-1/sqrt(fan)))."""
    fan = c_in * k * k
    lim = 1.0 / float(np.sqrt(fan))
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (c_out, c_in, k, k), jnp.float32, -lim, lim)}
    if bias:
        p["b"] = jax.random.uniform(kb, (c_out,), jnp.float32, -lim, lim)
    return p


def _conv(p: dict, x: jnp.ndarray, padding: str = "SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


def _init_bn(c: int) -> dict:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _bn(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]


def _init_double_conv(key, c_in: int, c_out: int, c_mid: int = None) -> dict:
    c_mid = c_mid or c_out
    k1, k2 = jax.random.split(key)
    return {
        "bn1": _init_bn(c_in),
        "conv1": _init_conv(k1, c_in, c_mid, 3, bias=False),
        "bn2": _init_bn(c_mid),
        "conv2": _init_conv(k2, c_mid, c_out, 3, bias=False),
    }


def _double_conv(p, x, key=None, dropout=0.0):
    h = jax.nn.relu(_bn(p["bn1"], x))
    if dropout > 0.0 and key is not None:
        key, k = jax.random.split(key)
        h = h * jax.random.bernoulli(k, 1 - dropout, h.shape) / (1 - dropout)
    h = _conv(p["conv1"], h)
    h = jax.nn.relu(_bn(p["bn2"], h))
    if dropout > 0.0 and key is not None:
        key, k = jax.random.split(key)
        h = h * jax.random.bernoulli(k, 1 - dropout, h.shape) / (1 - dropout)
    return _conv(p["conv2"], h)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def _upsample2(x):
    """Bilinear x2, align_corners=True (torch nn.Upsample semantics)."""
    N, C, H, W = x.shape
    return jax.image.resize(x, (N, C, H * 2, W * 2), method="bilinear")


def _init_attn(key, c: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "norm": _init_bn(c),
        "qkv": _init_conv(k1, c, 3 * c, 1, bias=False),
        "proj": _init_conv(k2, c, c, 1, bias=False),
    }


def _attn(p, x, num_head: int = 8):
    """Multi-head self-attention over the HxW grid (unet.py:74-108)."""
    N, C, H, W = x.shape
    h = _bn(p["norm"], x)
    qkv = _conv(p["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=1)
    d = C // num_head
    q = q.reshape(N, num_head, d, H * W).transpose(0, 1, 3, 2)
    k = k.reshape(N, num_head, d, H * W)
    v = v.reshape(N, num_head, d, H * W).transpose(0, 1, 3, 2)
    w = jnp.matmul(q, k, precision=jax.lax.Precision.DEFAULT) * (d ** -0.5)
    w = jax.nn.softmax(w, axis=-1)
    h = jnp.matmul(w, v)
    h = h.reshape(N, H, W, C).transpose(0, 3, 1, 2)
    return x + _conv(p["proj"], h)


def init_unet(key, in_channels: int = 3, channels: int = 32,
              out_channels: int = 1) -> dict:
    ks = jax.random.split(key, 11)
    c = channels
    return {
        "inc": _init_conv(ks[0], in_channels, c, 1),
        "down1": _init_double_conv(ks[1], c, 2 * c),
        "down2": _init_double_conv(ks[2], 2 * c, 4 * c),
        "down3": _init_double_conv(ks[3], 4 * c, 8 * c),
        "down4": _init_double_conv(ks[4], 8 * c, 8 * c),
        "attn": _init_attn(ks[5], 8 * c),
        "up1": _init_double_conv(ks[6], 16 * c, 4 * c, 16 * c),
        "up2": _init_double_conv(ks[7], 8 * c, 2 * c, 8 * c),
        "up3": _init_double_conv(ks[8], 4 * c, c, 4 * c),
        "up4": _init_double_conv(ks[9], 2 * c, c, 2 * c),
        "out_bn": _init_bn(c),
        "outc": _init_conv(ks[10], c, out_channels, 1),
    }


def _pad_to(x1, x2):
    """Pad x1 spatially to x2's shape (Up.forward, unet.py:63-69)."""
    dy = x2.shape[2] - x1.shape[2]
    dx = x2.shape[3] - x1.shape[3]
    return jnp.pad(
        x1, ((0, 0), (0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2))
    )


def apply_unet(params: dict, x: jnp.ndarray, key=None,
               dropout: float = 0.0) -> jnp.ndarray:
    """[N, in_ch, H, W] -> [N, 1, H, W] refined raydrop probability.
    H and W must be divisible by 16 (4 maxpool levels); pad beforehand."""
    dc = functools.partial(_double_conv, key=key, dropout=dropout)
    x0 = _conv(params["inc"], x)
    x1 = dc(params["down1"], _maxpool2(x0))
    x2 = dc(params["down2"], _maxpool2(x1))
    x3 = dc(params["down3"], _maxpool2(x2))
    x4 = dc(params["down4"], _maxpool2(x3))
    x4 = _attn(params["attn"], x4)

    def up(p, a, b):
        a = _pad_to(_upsample2(a), b)
        return dc(p, jnp.concatenate([b, a], axis=1))

    h = up(params["up1"], x4, x3)
    h = up(params["up2"], h, x2)
    h = up(params["up3"], h, x1)
    h = up(params["up4"], h, x0)
    logits = _conv(params["outc"], jax.nn.relu(_bn(params["out_bn"], h)))
    return jax.nn.sigmoid(logits)


def _pad16(x_chw: jnp.ndarray):
    """Pad [C, H, W] spatially to multiples of 16 (4 maxpool levels);
    returns (padded, (H, W)) for cropping back."""
    C, H, W = x_chw.shape
    Hp = -(-H // 16) * 16
    Wp = -(-W // 16) * 16
    return jnp.pad(x_chw, ((0, 0), (0, Hp - H), (0, Wp - W))), (H, W)


def refine_raydrop_unet(params: dict, raydrop_hw: jnp.ndarray,
                        intensity_hw: jnp.ndarray,
                        depth_hw: jnp.ndarray) -> jnp.ndarray:
    """Image-shaped UNet inference: the LiDAR4D input convention
    [raydrop, intensity, depth] -> refined raydrop probability [H, W]."""
    x, (H, W) = _pad16(jnp.stack([raydrop_hw, intensity_hw, depth_hw], 0))
    return apply_unet(params, x[None])[0, 0, :H, :W]


def train_unet_refiner(
    key,
    raydrop: np.ndarray,           # [N, H, W] rendered raydrop per frame
    intensity: np.ndarray,         # [N, H, W] rendered intensity
    depth: np.ndarray,             # [N, H, W] rendered depth (pre-scaled)
    gt_raydrop: np.ndarray,        # [N, H, W] ground-truth hit mask
    epochs: int = 100,
    lr: float = 5e-4,
    decay_rate: float = 0.1,
    n_iters: int = 10_000,
    channels: int = 32,
    log_every: int = 0,
):
    """Offline UNet refinement: same schedule as the MLP refiner
    (extre_train_raydrop.py:120-160 — Adam, MSE, exponential decay), but
    the model is the LiDAR4D UNet (scene/unet.py:139-171) on the full
    [raydrop, intensity, depth] image. Returns (params, history)."""
    import optax

    params = init_unet(key, in_channels=3, channels=channels)
    sched = lambda step: lr * decay_rate ** (step / n_iters)
    opt = optax.adam(learning_rate=sched, b1=0.9, b2=0.999)
    opt_state = opt.init(params)

    H, W = raydrop.shape[1:]

    @jax.jit
    def step(params, opt_state, x, gt):
        def loss_fn(p):
            pred = apply_unet(p, x[None])[0, 0, :H, :W]   # loss on real pixels
            return jnp.mean((pred - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    frames = []
    for i in range(raydrop.shape[0]):
        x, _ = _pad16(jnp.asarray(
            np.stack([raydrop[i], intensity[i], depth[i]], 0), jnp.float32))
        frames.append((x, jnp.asarray(gt_raydrop[i], jnp.float32)))

    history = []
    for epoch in range(epochs):
        for x, gt in frames:
            params, opt_state, loss = step(params, opt_state, x, gt)
        history.append(float(loss))
        if log_every and (epoch + 1) % log_every == 0:
            print(f"[unet] epoch {epoch + 1}: loss {float(loss):.6f}")
    return params, history
