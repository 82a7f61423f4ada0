"""Evaluation metric suite.

Replicates the reference's test-iteration sweep (train.py:299-378):
intensity L1/PSNR/SSIM/MAE/RMSE/MedAE with the rendered-raydrop mask, and
depth CD/F-score (tau=0.05)/MAE/RMSE/MedAE with depth clamped to
[depth_min, depth_max]. The eval SSIM mirrors skimage.structural_similarity
defaults (uniform 7x7 window, unbiased covariance, border crop) — the
reference uses skimage here (train.py:347-349), not its training SSIM.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..lidar.pano import pano_to_lidar
from ..ops.knn import chamfer_distance, fscore


def eval_ssim(img1: np.ndarray, img2: np.ndarray, win: int = 7,
              data_range: float = 1.0) -> float:
    """skimage.metrics.structural_similarity semantics: uniform win x win
    filter, unbiased covariance (N/(N-1)), crop (win-1)//2 borders."""
    from scipy import ndimage  # available via jax/scipy stack

    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    NP = win * win
    cov_norm = NP / (NP - 1)
    uf = lambda x: ndimage.uniform_filter(x, size=win, mode="nearest")
    ux, uy = uf(img1), uf(img2)
    uxx, uyy, uxy = uf(img1 * img1), uf(img2 * img2), uf(img1 * img2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    pad = (win - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())


def evaluate_frame(
    render_color: np.ndarray,     # [2,H,W]
    render_depth: np.ndarray,     # [H,W]
    gt_image: np.ndarray,         # [3,H,W]
    beams: np.ndarray,
    depth_min: float = 5.0,
    depth_max: float = 80.0,
    compute_chamfer: bool = True,
) -> Dict[str, float]:
    render_color = np.asarray(render_color)
    render_depth = np.asarray(render_depth)
    gt_image = np.asarray(gt_image)
    beams = np.asarray(beams)

    ray_drop = gt_image[0]
    gt_intensity = gt_image[1] * ray_drop
    gt_depth = gt_image[2] * ray_drop

    rd_mask = (render_color[1] > 0.5).astype(np.float32)
    image = np.clip(render_color[0], 0.0, 1.0) * rd_mask

    err = np.abs(image - gt_intensity)
    mse = float((err**2).mean())
    out = {
        "intensity_l1": float(err.mean()),
        "intensity_psnr": float(20 * np.log10(1.0 / np.sqrt(max(mse, 1e-20)))),
        "intensity_mae": float(err.mean()),
        "intensity_rmse": float(np.sqrt((err**2).mean())),
        "intensity_medae": float(np.median(err)),
        "intensity_ssim": eval_ssim(image, gt_intensity),
        "raydrop_acc": float((rd_mask == ray_drop).mean()),
    }

    depth_render = np.clip(render_depth, depth_min, depth_max) * rd_mask
    derr = np.abs(depth_render - gt_depth)
    out.update(
        depth_mae=float(derr.mean()),
        depth_rmse=float(np.sqrt((derr**2).mean())),
        depth_medae=float(np.median(derr)),
    )

    if compute_chamfer:
        pred_pts = pano_to_lidar(depth_render, beam_inclinations=beams)
        gt_pts = pano_to_lidar(gt_depth, beam_inclinations=beams)
        if len(pred_pts) > 0 and len(gt_pts) > 0:
            # static capacity = the pixel count: one compile for the sweep
            H, W = render_depth.shape
            cd, d1, d2, v1, v2 = chamfer_distance(pred_pts, gt_pts,
                                                  capacity=H * W)
            f, _, _ = fscore(d1, d2, threshold=0.05, v1=v1, v2=v2)
            out["depth_cd"] = cd
            out["depth_fscore"] = f
        else:
            out["depth_cd"] = float("inf")
            out["depth_fscore"] = 0.0
    return out


def mean_metrics(per_frame: list[Dict[str, float]]) -> Dict[str, float]:
    keys = per_frame[0].keys()
    return {k: float(np.mean([m[k] for m in per_frame])) for k in keys}
