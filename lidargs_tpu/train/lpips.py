"""LPIPS(VGG-16) perceptual metric — JAX/TPU implementation.

Spec: the reference evaluates LPIPS with the richzhang `lpips` package,
net='vgg' (train.py:36,52,519 and the vendored lpipsPyTorch/modules/*):

  * inputs are passed straight through (the reference calls
    `lpips_fn(render, gt)` on [0,1] images WITHOUT normalize=True —
    reproduced verbatim, quirk included);
  * a fixed scaling layer z-scores RGB with shift (−.030, −.088, −.188)
    and scale (.458, .448, .450) (lpipsPyTorch/modules/networks.py:41-44);
  * VGG-16 features are taken after relu1_2, relu2_2, relu3_3, relu4_3,
    relu5_3 (torchvision .features indices 4/9/16/23/30,
    networks.py:100-104), channel-unit-normalized with eps=1e-10
    (modules/utils.py:6-8);
  * squared differences go through per-layer 1×1 "lin" convs and a spatial
    mean, summed over the 5 layers (modules/lpips.py:31-36).

Pretrained weights cannot be fetched in this environment (zero egress), so
the component ships as architecture + a weights-file hook: convert the
torchvision VGG16 IMAGENET1K_V1 conv weights + the lpips v0.1 lin weights
once with tools/convert_lpips_weights.py, then pass the .npz path (CLI
`--lpips_weights`). Eval skips LPIPS cleanly when no weights file is given.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 .features conv layout: (out_channels, block index)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# features indices whose (post-relu) activations feed LPIPS
_N_CONVS = 13
_N_LAYERS = 5
LIN_CHANNELS = (64, 128, 256, 512, 512)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)
# conv index (0-based, counting convs only) after which a feature is tapped:
# relu1_2 -> conv 1, relu2_2 -> conv 3, relu3_3 -> conv 6, relu4_3 -> conv 9,
# relu5_3 -> conv 12
_TAP_AFTER = (1, 3, 6, 9, 12)


def random_lpips_params(key, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree with the exact VGG16+lin shapes — used
    by tests to cross-check the architecture against torch."""
    params = {"conv_w": [], "conv_b": [], "lin_w": []}
    cin = 3
    k = key
    for v in _VGG_CFG:
        if v == "M":
            continue
        k, k1, k2 = jax.random.split(k, 3)
        params["conv_w"].append(
            jax.random.normal(k1, (v, cin, 3, 3), dtype) * 0.1
        )
        params["conv_b"].append(jax.random.normal(k2, (v,), dtype) * 0.1)
        cin = v
    for nc in LIN_CHANNELS:
        k, k1 = jax.random.split(k)
        params["lin_w"].append(
            jax.random.uniform(k1, (1, nc, 1, 1), dtype, 0.0, 0.2)
        )
    return params


def load_lpips_params(path: str) -> dict:
    """Load the npz produced by tools/convert_lpips_weights.py."""
    z = np.load(path)
    params = {
        "conv_w": [jnp.asarray(z[f"conv{i}_w"]) for i in range(_N_CONVS)],
        "conv_b": [jnp.asarray(z[f"conv{i}_b"]) for i in range(_N_CONVS)],
        "lin_w": [jnp.asarray(z[f"lin{i}_w"]) for i in range(_N_LAYERS)],
    }
    return params


def _conv3x3(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + b[None, :, None, None]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def _vgg_features(params, x):
    """[N,3,H,W] -> 5 tapped post-relu feature maps."""
    feats = []
    ci = 0
    for v in _VGG_CFG:
        if v == "M":
            x = _maxpool2(x)
            continue
        x = jax.nn.relu(_conv3x3(x, params["conv_w"][ci], params["conv_b"][ci]))
        if ci in _TAP_AFTER:
            feats.append(x)
        ci += 1
    return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips(params: dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[N,3,H,W] pair -> [N] LPIPS distances. Inputs are fed to the scaling
    layer as-is (the reference's no-normalize call convention)."""
    zx = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    zy = (y - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    fx = _vgg_features(params, zx)
    fy = _vgg_features(params, zy)
    total = 0.0
    for fxi, fyi, lw in zip(fx, fy, params["lin_w"]):
        d = (_unit_normalize(fxi) - _unit_normalize(fyi)) ** 2
        lin = jax.lax.conv_general_dilated(
            d, lw, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        total = total + jnp.mean(lin, axis=(1, 2, 3))
    return total


def lpips_single(params: dict, img_a: jnp.ndarray, img_b: jnp.ndarray):
    """[C,H,W] or [H,W] single-image convenience: grayscale is tiled to the
    3 RGB channels (LiDAR intensity/range images are single-channel; the
    reference feeds the saved PNG renders, i.e. the same value per channel).
    """
    def to3(img):
        if img.ndim == 2:
            img = img[None]
        if img.shape[0] == 1:
            img = jnp.tile(img, (3, 1, 1))
        return img[None, :3]

    return lpips(params, to3(img_a), to3(img_b))[0]
