"""Losses and image metrics.

Formulas match the reference exactly: l1/l2 (`utils/loss_utils.py:18-22`),
11x11 sigma-1.5 gaussian-window SSIM with same-padding (`:24-64`), PSNR
(`utils/image_utils.py:17-19`), and the five-term training loss
(`train.py:150-203`).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x, y):
    return jnp.mean((x - y) ** 2)


def psnr(img, gt):
    mse = jnp.mean((img - gt) ** 2, axis=(-3, -2, -1))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-20)))


def _sep_conv(x: jnp.ndarray, g: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Zero-padded 'SAME' 1-D convolution along `axis` of [C,H,W] as a
    shift-and-accumulate sum — f32 exact, fuses to ~2·taps VPU ops.

    Why not lax.conv: single-channel f32 convs are load-bearing here (the
    TPU default bf16 conv makes conv(x^2) - mu^2 exceed the SSIM c2=9e-4
    stabilizer, driving the denominator through zero -> +/-inf loss), and
    Precision.HIGHEST on a 1-channel 11x11 conv lowers to a ~170 ms
    monstrosity on TPU. The gaussian window is separable, so two shifted
    sums give the exact f32 result at VPU cost."""
    taps = g.shape[0]
    r = taps // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    out = jnp.zeros_like(x)
    for t in range(taps):
        out = out + g[t] * jax.lax.slice_in_dim(xp, t, t + n, axis=axis)
    return out


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """[C,H,W] single-image SSIM, mean-reduced."""
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x**2) / (2 * 1.5**2))
    g = g / g.sum()

    def conv(x):
        return _sep_conv(_sep_conv(x, g, axis=1), g, axis=2)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # window variances are mathematically >= 0; clamp the residual float
    # cancellation so the denominator stays positive
    s1 = jnp.maximum(conv(img1 * img1) - mu1_sq, 0.0)
    s2 = jnp.maximum(conv(img2 * img2) - mu2_sq, 0.0)
    s12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


class LossTerms(NamedTuple):
    total: jnp.ndarray
    depth: jnp.ndarray
    intensity: jnp.ndarray
    raydrop: jnp.ndarray
    scale_reg: jnp.ndarray
    grad_x: jnp.ndarray
    l1_intensity: jnp.ndarray
    ssim_intensity: jnp.ndarray


def lidar_losses(
    render_color: jnp.ndarray,   # [2,H,W] intensity, raydrop
    render_depth: jnp.ndarray,   # [H,W]
    gt_image: jnp.ndarray,       # [3,H,W] raydrop, intensity, depth
    scaling: jnp.ndarray,        # [N,3] decoded cov scales
    scaling_mask: jnp.ndarray,   # [N] gaussians that exist
    lambda_dssim: float = 0.2,
    raydrop_lambda: float = 10.0,
    scale_reg: float = 0.01,
    grad_clip_x: float = 0.01,
    pixel_mask: jnp.ndarray = None,   # optional [H,W] bool loss mask
) -> LossTerms:
    """The reference training loss (train.py:150-203): GT-raydrop-masked
    depth L1 + intensity L1/SSIM mix + raydrop MSE + scale-product
    regularizer + masked azimuth-gradient L1.

    `pixel_mask` restricts every pixel term to a region — the dynamic
    decomposition trains the background / each vehicle on its own pixels
    (scene/waymoDynamic.py:245-275)."""
    ray_drop = gt_image[0:1]
    if pixel_mask is not None:
        ray_drop = ray_drop * pixel_mask[None]
    gt_intensity = gt_image[1:2] * ray_drop
    gt_depth = gt_image[2:3] * ray_drop

    render_intensity = render_color[0:1] * ray_drop
    render_raydrop = render_color[1:2]
    if pixel_mask is not None:
        render_raydrop = render_raydrop * pixel_mask[None]
    depth = render_depth[None] * ray_drop

    raydrop_loss = raydrop_lambda * l2_loss(render_raydrop, ray_drop)
    ll1 = l1_loss(render_intensity, gt_intensity)
    depth_loss = l1_loss(depth, gt_depth)
    ssim_loss = 1.0 - ssim(render_intensity, gt_intensity)
    intensity_loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * ssim_loss

    n_sel = jnp.maximum(jnp.sum(scaling_mask), 1.0)
    scaling_reg = scale_reg * jnp.sum(
        jnp.prod(scaling, axis=-1) * scaling_mask
    ) / n_sel

    pred_gx = jnp.abs(depth[:, :, :-1] - depth[:, :, 1:])
    gt_gx = jnp.abs(gt_depth[:, :, :-1] - gt_depth[:, :, 1:])
    mask_dx = ray_drop[:, :, :-1] * (gt_gx < grad_clip_x)
    grad_loss = l1_loss(pred_gx * mask_dx, gt_gx * mask_dx)

    total = depth_loss + intensity_loss + raydrop_loss + scaling_reg + grad_loss
    return LossTerms(
        total=total,
        depth=depth_loss,
        intensity=intensity_loss,
        raydrop=raydrop_loss,
        scale_reg=scaling_reg,
        grad_x=grad_loss,
        l1_intensity=ll1,
        ssim_intensity=ssim_loss,
    )


# ---------------------------------------------------------------------------
# surfel (2DGS) regularizers — the reference's surfel rasterizer computes the
# distortion / normal / median-depth channels (surfel forward.cu:495-543) but
# its training glue was never released; weights follow the 2DGS paper.
# ---------------------------------------------------------------------------

def depth_normals(depth: jnp.ndarray, beams: jnp.ndarray, W: int) -> jnp.ndarray:
    """Differentiable surface normals from a range image: back-project each
    pixel along its beam ray, cross finite differences. Returns [3, H, W]
    (unnormalized where neighbors are missing)."""
    H = beams.shape[0]
    rows = jnp.arange(H)[:, None] * jnp.ones((1, depth.shape[1]), jnp.int32)
    cols = jnp.arange(depth.shape[1])[None, :] * jnp.ones((H, 1), jnp.int32)
    alp = beams[H - 1 - rows]
    beta = -(cols.astype(jnp.float32) - W / 2.0) / W * 2.0 * jnp.pi
    dirs = jnp.stack(
        [jnp.cos(alp) * jnp.cos(beta), jnp.cos(alp) * jnp.sin(beta), jnp.sin(alp)], 0
    )
    pts = dirs * depth[None]                               # [3,H,W]
    dc = jnp.diff(pts, axis=2, append=pts[:, :, -1:])
    dr = jnp.diff(pts, axis=1, append=pts[:, -1:, :])
    n = jnp.cross(dc, dr, axis=0)
    # double-where: sqrt at 0 has a NaN gradient even though the rows are
    # masked downstream (empty pixels have zero cross products)
    nn2 = jnp.sum(n * n, axis=0, keepdims=True)
    ok = nn2 > 1e-16
    return jnp.where(ok, n, 0.0) / jnp.sqrt(jnp.where(ok, nn2, 1.0))


def normal_consistency_loss(
    normal: jnp.ndarray,        # [3,H,W] rendered surfel normal (world frame)
    depth: jnp.ndarray,         # [H,W] rendered depth
    beams: jnp.ndarray,
    W: int,
    hit_mask: jnp.ndarray,      # [H,W] pixels that count
) -> jnp.ndarray:
    """2DGS normal-consistency: 1 - n_render . n_depth over hit pixels. The
    depth normal is computed in the sensor frame; `normal` must be in the
    same frame (render_surfels emits sensor-frame normals)."""
    nd = depth_normals(depth, beams, W)
    rn2 = jnp.sum(normal * normal, axis=0, keepdims=True)
    rok = rn2 > 1e-16
    nr = jnp.where(rok, normal, 0.0) / jnp.sqrt(jnp.where(rok, rn2, 1.0))
    cos = jnp.sum(nr * nd, axis=0)
    m = hit_mask * (depth > 0)
    return jnp.sum((1.0 - jnp.abs(cos)) * m) / jnp.maximum(jnp.sum(m), 1.0)


# ---------------------------------------------------------------------------
# ray-drop segmentation losses (defined in the reference but unused by its
# train loop: raydrop_lossf, utils/loss_utils.py:66-101 + lovasz_softmax.py)
# ---------------------------------------------------------------------------

def lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension wrt sorted errors (Alg. 1,
    lovasz_softmax.py:49-62)."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax_flat(probas: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Multi-class Lovasz-Softmax (lovasz_softmax.py:64-87). probas [P, C],
    labels [P] in [0, C); classes absent from the batch are skipped (masked
    mean — static shapes, unlike the torch early-continue)."""
    P, C = probas.shape
    valid_lbl = labels >= 0
    losses = []
    present = []
    for c in range(C):
        fg = ((labels == c) & valid_lbl).astype(jnp.float32)
        errors = jnp.abs(fg - probas[:, c])
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        losses.append(jnp.dot(errors_sorted, lovasz_grad(fg_sorted)))
        present.append(jnp.sum(fg) > 0)
    losses = jnp.stack(losses)
    present = jnp.stack(present).astype(jnp.float32)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)


def get_ce_weights(gt_label: jnp.ndarray, n_classes: int,
                   max_weights: float = 50.0) -> jnp.ndarray:
    """Online inverse-frequency class weights (loss_utils.py:66-76)."""
    eps = 1e-20
    counts = jnp.stack(
        [jnp.sum(gt_label == c).astype(jnp.float32) + eps for c in range(n_classes)]
    )
    inv_freq = jnp.sum(counts) / counts
    return jnp.clip(jnp.sqrt(inv_freq), 0.0, max_weights)


def raydrop_lossf(est: jnp.ndarray, gt: jnp.ndarray, lambda_bce: float = 0.15,
                  lambda_lov: float = 0.15, reweight: bool = True) -> jnp.ndarray:
    """Weighted CE + Lovasz-softmax ray-drop loss (loss_utils.py:78-101).
    est: [B, C] logits; gt: [B] int labels (-1 = ignore)."""
    B, C = est.shape
    logp = jax.nn.log_softmax(est, axis=1)
    ok = gt >= 0
    gt_safe = jnp.where(ok, gt, 0)
    nll = -jnp.take_along_axis(logp, gt_safe[:, None], axis=1)[:, 0]
    if reweight:
        w = get_ce_weights(jnp.where(ok, gt, C), C)
        ws = w[gt_safe] * ok
    else:
        ws = ok.astype(jnp.float32)
    ce = jnp.sum(nll * ws) / jnp.maximum(jnp.sum(ws), 1e-20)
    lov = lovasz_softmax_flat(jax.nn.softmax(est, axis=1),
                              jnp.where(ok, gt, -1))
    return lambda_bce * ce + lambda_lov * lov
