"""Per-Gaussian range-view projection ("preprocess").

TPU-native re-design of the reference CUDA preprocess kernel
(`diff_lidargs_rasterization/cuda_rasterizer/forward.cu:257-384`): one fully
vectorized, autodiff-able JAX function over all gaussians instead of a
per-thread kernel. Semantics are kept exactly:

  * view transform + euclidean range cull  (forward.cu:298-305)
  * cov3D from scale/quat                  (computeCov3D, forward.cu:216-253)
  * micro cross-section basis u1,u2 ⟂ ray  (_proj_2basis, forward.cu:95-119)
  * cov projected on the plane, +lowpass, scaled 1/dist^2
                                           (computeCov2D_lidar + forward.cu:318-321)
  * conic + max-eigenvalue radius          (forward.cu:322-330)
  * azimuth column p_c, elevation row p_r via binary search over the
    ascending beam table with fractional interpolation and
    ray-divergence-angle rejection         (forward.cu:333-359)
  * anisotropic pixel radii r_x, r_y       (forward.cu:361-362)
  * the reference's 16x1-block tile rect   (getRect_lidar, auxiliary.h:80-92)

The reference rect is retained in *pixel* units ("parity rect"): during
compositing a gaussian contributes to a pixel only if the pixel lies inside
it. This makes rendered images independent of our physical TPU tile shape
and bit-comparable with the reference's 16x1-strip rasterization.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (r, x, y, z) -> [..., 3, 3]. Standard rotation matrix, same
    layout as the reference (`utils/general_utils.py:79-100`). The caller is
    responsible for normalization (the reference normalizes Python-side)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """World-space covariance Sigma = R S^2 R^T, [..., 3, 3]
    (computeCov3D, forward.cu:216-253 / build_covariance_from_scaling_rotation,
    gaussian_model.py:33-37)."""
    R = quat_to_rotmat(quats)
    RS = R * scales[..., None, :]          # R @ diag(s)
    return jnp.matmul(RS, jnp.swapaxes(RS, -1, -2), precision=jax.lax.Precision.HIGHEST)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the INVERSE of unit quaternion q = (r, x, y, z), i.e.
    R(q)^T v, without materializing [P, 3, 3] matrices:
    R(q*) v = v + 2 q_v x (q_v x v - r v) for the conjugate q* = (r, -q_v)."""
    r = q[..., :1]
    qv = -q[..., 1:]                       # conjugate
    uv = jnp.cross(qv, v)
    return v + 2.0 * (r * uv + jnp.cross(qv, uv))


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by unit quaternion q = (r, x, y, z), i.e. R(q) v."""
    r = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    return v + 2.0 * (r * uv + jnp.cross(qv, uv))


class Splats(NamedTuple):
    """Preprocessed per-gaussian render state (the analogue of the CUDA
    GeometryState buffers, rasterizer_impl.h:23-40).

    The per-gaussian leading shape [P] below is whatever the caller passed
    in — preprocess_gaussians is elementwise over gaussians, so any leading
    batch shape works. Production (render_field) flattens the anchor-major
    decode to [P, .] at this boundary: keeping [C, k, .] through packing
    re-tiles the packed [C,k,F] rows at the cull (measured 2x worse,
    DESIGN §13), while flattening the narrow inputs here is the cheapest
    site for the one relayout the pipeline needs."""

    valid: jnp.ndarray        # [P] bool — survives culling
    depth: jnp.ndarray        # [P] euclidean range (sort key + depth channel)
    sphere_mean: jnp.ndarray  # [P,3] unit view direction of the mean
    u1: jnp.ndarray           # [P,3] cross-section basis 1 (view space)
    u2: jnp.ndarray           # [P,3] cross-section basis 2 (view space)
    conic: jnp.ndarray        # [P,3] inverse 2x2 covariance (a, b, c)
    opacity: jnp.ndarray      # [P]
    feat: jnp.ndarray         # [P,C] composited channels (intensity, raydrop)
    center: jnp.ndarray       # [P,2] float image coords (p_c, p_r)
    radii_xy: jnp.ndarray     # [P,2] int pixel radii (r_x, r_y)
    pix_rect: jnp.ndarray     # [P,4] parity rect: x0, x1, y0, y1 (pixel units)


def _project_rows(alpha_el: jnp.ndarray, beams: jnp.ndarray, rda: float,
                  margin: float = 2.0):
    """Elevation angle -> fractional row (pre-flip) + local beam gap +
    divergence rejection. Mirrors forward.cu:336-358 incl. the asymmetric
    index-0 branch. The beam-splatting variant rejects at 2x the ray
    divergence angle (forward.cu:345,356); the surfel variant at 1x
    (surfel forward.cu:163,170) — hence `margin`."""
    H = beams.shape[0]
    idx = jnp.clip(jnp.searchsorted(beams, alpha_el, side="left"), 0, H - 1)
    hi = idx > 0
    before = jnp.where(hi, beams[jnp.maximum(idx - 1, 0)], beams[0])
    after = jnp.where(hi, beams[idx], beams[1])
    gap = after - before
    frac_hi = (alpha_el - before) / gap
    row_hi = idx - 1 + frac_hi
    row_lo = 1 + (alpha_el - after) / gap
    row = jnp.where(hi, row_hi, row_lo)
    ok = jnp.where(
        hi,
        alpha_el <= after + margin * rda,
        alpha_el >= before - margin * rda,
    )
    return row, gap, ok


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """C round() for the (non-negative after clamping) rect bounds."""
    return jnp.floor(x + 0.5)


def preprocess_gaussians(
    means3d: jnp.ndarray,     # [...,3] world (any per-gaussian leading shape)
    scales: jnp.ndarray,      # [...,3] covariance scales (activated)
    quats: jnp.ndarray,       # [...,4] normalized (r,x,y,z)
    opacities: jnp.ndarray,   # [...]
    feat: jnp.ndarray,        # [...,C]
    mask: jnp.ndarray,        # [...] bool — upstream validity (padding/opacity)
    w2s_rot: jnp.ndarray,     # [3,3]
    w2s_trans: jnp.ndarray,   # [3]
    beams: jnp.ndarray,       # [H] ascending inclinations
    W: int,
    cfg: RasterConfig,
) -> Splats:
    H = beams.shape[0]
    f32 = jnp.float32
    two_pi = 2.0 * jnp.pi

    # tiny geometric matmuls must stay f32 on the MXU (default TPU matmul
    # precision is bf16, which breaks range-image parity)
    hi = jax.lax.Precision.HIGHEST
    p_view_raw = jnp.matmul(means3d, w2s_rot.T, precision=hi) + w2s_trans  # [...,3]

    # Double-where NaN hygiene: padded/degenerate rows are replaced by a safe
    # point *before* any singular op (norm/atan2 at the origin have NaN
    # gradients that a post-hoc where cannot remove). The reference's CUDA
    # kernels simply never launch threads for such rows.
    sq = jnp.sum(p_view_raw * p_view_raw, axis=-1)
    mask = mask & (sq > 0.0)
    e_x = jnp.array([1.0, 0.0, 0.0], p_view_raw.dtype)
    p_view = jnp.where(mask[..., None], p_view_raw, e_x)
    dist = jnp.sqrt(jnp.sum(p_view * p_view, axis=-1))
    valid = mask & (dist < cfg.far) & (dist > cfg.near)

    # --- micro cross-section basis (view space), _proj_2basis ---
    safe_dist = jnp.maximum(dist, 1e-12)
    dirn = p_view / safe_dist[..., None]
    horiz2 = dirn[..., 0] ** 2 + dirn[..., 1] ** 2
    degenerate = horiz2 <= 0.0
    valid = valid & ~degenerate
    u1_raw = jnp.stack([dirn[..., 1], -dirn[..., 0], jnp.zeros_like(dist)], -1)
    u1_raw = jnp.where(degenerate[..., None], e_x, u1_raw)
    u1_len = jnp.sqrt(jnp.where(degenerate, 1.0, horiz2))
    u1 = u1_raw / u1_len[..., None]
    u2 = jnp.cross(dirn, u1)

    # --- cov3D -> projected 2x2 cov (computeCov2D_lidar) ---
    # cov_ab = u_a_view^T (W Sigma_w W^T) u_b_view with W = w2s_rot and
    # Sigma_w = R S^2 R^T, i.e. cov_ab = (S R^T W^T u_a) . (S R^T W^T u_b).
    # Rotating u1/u2 into the gaussian's local frame via the quaternion
    # needs no [P,3,3] covariance matrices (~5x fewer flops + intermediates
    # than the einsum chain; same math as computeCov2D_lidar,
    # forward.cu:146-169).
    u1w = jnp.matmul(u1, w2s_rot, precision=hi)                   # W^T u1
    u2w = jnp.matmul(u2, w2s_rot, precision=hi)
    v1 = quat_rotate_inv(quats, u1w) * scales                     # S R^T W^T u1
    v2 = quat_rotate_inv(quats, u2w) * scales
    inv_d2 = 1.0 / jnp.maximum(dist * dist, 1e-20)
    a = (jnp.sum(v1 * v1, -1) + cfg.lowpass) * inv_d2
    b = (jnp.sum(v1 * v2, -1)) * inv_d2
    c = (jnp.sum(v2 * v2, -1) + cfg.lowpass) * inv_d2

    det = a * c - b * b
    valid = valid & (det > 0.0)
    det_safe = jnp.where(det > 0.0, det, 1.0)
    conic = jnp.stack([c, -b, a], -1) / det_safe[..., None]

    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(1e-9, mid * mid - det))
    sigma = jnp.sqrt(jnp.maximum(1e-9, lam_max))

    # --- range-image coordinates ---
    p_flat = jnp.where(degenerate[..., None], e_x, p_view)  # guard atan2(0,0) grads
    beta = jnp.pi - jnp.arctan2(p_flat[..., 1], p_flat[..., 0])
    p_c = beta / (two_pi / W)
    horiz = jnp.sqrt(jnp.where(degenerate, 1.0, p_flat[..., 0] ** 2 + p_flat[..., 1] ** 2))
    alpha_el = jnp.arctan2(p_flat[..., 2], horiz)
    row, gap, row_ok = _project_rows(alpha_el, beams, cfg.ray_divergence_angle)
    valid = valid & row_ok
    p_r = H - row - 1.0

    r_y = jnp.ceil(3.0 * sigma / jnp.tan(jnp.abs(gap)))
    r_x = jnp.ceil(3.0 * sigma / jnp.tan(two_pi / W))

    # --- the reference's tile rect (BLOCK 16x1), kept in pixel units ---
    bx, by = cfg.ref_block_x, cfg.ref_block_y
    grid_x = -(-W // bx)
    rmin_x = jnp.clip(jnp.floor((p_c - r_x) / bx), 0, grid_x)
    rmax_x = jnp.clip(jnp.floor((p_c + r_x + bx - 1) / bx), 0, grid_x)
    rmin_y = jnp.clip(_round_half_away((p_r - r_y) / by), 0, H)
    rmax_y = jnp.clip(
        jnp.maximum(_round_half_away(p_r + r_y / by), _round_half_away(p_r / by) + 1),
        0,
        H,
    )
    valid = valid & ((rmax_x - rmin_x) * (rmax_y - rmin_y) > 0)

    pix_rect = jnp.stack([rmin_x * bx, rmax_x * bx, rmin_y * by, rmax_y * by], -1)

    zero_if = lambda x: jnp.where(
        valid if x.ndim == valid.ndim else valid[..., None], x, jnp.zeros_like(x)
    )
    # finite sort-last sentinel (inf would 0*inf=NaN in masked compositing)
    depth_sentinel = 4.0 * cfg.far
    return Splats(
        valid=valid,
        depth=jnp.where(valid, dist, depth_sentinel).astype(f32),
        sphere_mean=dirn.astype(f32),
        u1=u1.astype(f32),
        u2=u2.astype(f32),
        conic=zero_if(conic).astype(f32),
        opacity=jnp.where(valid, opacities, 0.0).astype(f32),
        feat=feat.astype(f32),
        center=jnp.stack([p_c, p_r], -1).astype(f32),
        radii_xy=jnp.where(valid[..., None], jnp.stack([r_x, r_y], -1), 0.0).astype(jnp.int32),
        pix_rect=pix_rect.astype(jnp.int32),
    )


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def preprocess_gaussians_hv(means3d, scales, quats, opacities, feat, mask,
                            w2s_rot, w2s_trans, beams, W, cfg):
    """preprocess_gaussians with a hand-derived single-pass VJP.

    XLA's autodiff of the projection costs ~4.4 ms fwd+bwd inside the
    default train step (stage_split --grad-prefix, r5) against a ~0.8 ms
    forward: the backward materializes ~20 narrow [P,x] residual arrays
    whose x<=4 minor dims pad to 128 lanes (DESIGN §13). This custom VJP
    saves ONLY the inputs and recomputes the (cheap, ~100 flop/gaussian)
    forward inside one fused backward chain that accumulates every input
    cotangent in a single pass — no residuals, no narrow materializations.

    Exactness: cotangents for means/scales/quats/opacities/feat and for
    the frame pose (w2s_rot, w2s_trans) are exact (verified against
    autodiff by tests/test_projection_vjp.py, incl. masked/degenerate/
    culled rows). The `beams` inclination table gets ZERO cotangent — it
    is a fixed sensor calibration everywhere in this framework and is
    never trained; autodiff would propagate into it.
    """
    return preprocess_gaussians(means3d, scales, quats, opacities, feat,
                                mask, w2s_rot, w2s_trans, beams, W, cfg)


def _pg_hv_fwd(means3d, scales, quats, opacities, feat, mask,
               w2s_rot, w2s_trans, beams, W, cfg):
    out = preprocess_gaussians(means3d, scales, quats, opacities, feat,
                               mask, w2s_rot, w2s_trans, beams, W, cfg)
    res = (means3d, scales, quats, opacities, mask, w2s_rot, w2s_trans,
           beams)
    return out, res


def _pg_hv_bwd(W, cfg, res, g):
    means3d, scales, quats, opacities, mask, w2s_rot, w2s_trans, beams = res
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    two_pi = 2.0 * jnp.pi
    H = beams.shape[0]

    dt = means3d.dtype

    def zt(x, like):
        # missing / float0 cotangents -> zeros of the primal out shape;
        # compute the chain in the INPUT dtype (f32 in production, f64
        # under the exactness test)
        if x is None or (hasattr(x, "dtype")
                         and x.dtype == jax.dtypes.float0):
            return jnp.zeros(like, dt)
        return x.astype(dt)

    lead = means3d.shape[:-1]
    Cc = g.feat.shape[-1] if hasattr(g.feat, "shape") else 1
    g_depth = zt(g.depth, lead)
    g_mean = zt(g.sphere_mean, lead + (3,))
    g_u1 = zt(g.u1, lead + (3,))
    g_u2 = zt(g.u2, lead + (3,))
    g_conic = zt(g.conic, lead + (3,))
    g_opac = zt(g.opacity, lead)
    g_feat = zt(g.feat, lead + (Cc,))
    g_center = zt(g.center, lead + (2,))

    # ---- recompute the forward chain (mirrors preprocess_gaussians
    # exactly, including every NaN guard / mask) ----
    p_view_raw = jnp.matmul(means3d, w2s_rot.T, precision=hi) + w2s_trans
    sq = jnp.sum(p_view_raw * p_view_raw, axis=-1)
    mask2 = mask & (sq > 0.0)
    e_x = jnp.array([1.0, 0.0, 0.0], p_view_raw.dtype)
    p_view = jnp.where(mask2[..., None], p_view_raw, e_x)
    dist = jnp.sqrt(jnp.sum(p_view * p_view, axis=-1))
    valid = mask2 & (dist < cfg.far) & (dist > cfg.near)

    safe_dist = jnp.maximum(dist, 1e-12)
    dirn = p_view / safe_dist[..., None]
    horiz2 = dirn[..., 0] ** 2 + dirn[..., 1] ** 2
    degenerate = horiz2 <= 0.0
    valid = valid & ~degenerate
    u1_raw = jnp.stack([dirn[..., 1], -dirn[..., 0],
                        jnp.zeros_like(dist)], -1)
    u1_raw = jnp.where(degenerate[..., None], e_x, u1_raw)
    u1_len = jnp.sqrt(jnp.where(degenerate, 1.0, horiz2))
    u1 = u1_raw / u1_len[..., None]
    u2 = jnp.cross(dirn, u1)

    u1w = jnp.matmul(u1, w2s_rot, precision=hi)
    u2w = jnp.matmul(u2, w2s_rot, precision=hi)
    w1 = quat_rotate_inv(quats, u1w)
    w2 = quat_rotate_inv(quats, u2w)
    v1 = w1 * scales
    v2 = w2 * scales
    inv_d2 = 1.0 / jnp.maximum(dist * dist, 1e-20)
    a = (jnp.sum(v1 * v1, -1) + cfg.lowpass) * inv_d2
    b = (jnp.sum(v1 * v2, -1)) * inv_d2
    c = (jnp.sum(v2 * v2, -1) + cfg.lowpass) * inv_d2
    det = a * c - b * b
    validc = valid & (det > 0.0)
    det_safe = jnp.where(det > 0.0, det, 1.0)

    p_flat = jnp.where(degenerate[..., None], e_x, p_view)
    horiz = jnp.sqrt(jnp.where(degenerate, 1.0,
                               p_flat[..., 0] ** 2 + p_flat[..., 1] ** 2))
    alpha_el = jnp.arctan2(p_flat[..., 2], horiz)
    row, gap, row_ok = _project_rows(alpha_el, beams,
                                     cfg.ray_divergence_angle)
    # final `valid` includes the rect-area test, which needs the radii
    # chain; none of the rect/radii outputs are differentiable, but the
    # conic/opacity/depth masks use the FINAL valid — recompute it.
    validf = validc & row_ok
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(1e-9, mid * mid - det))
    sigma = jnp.sqrt(jnp.maximum(1e-9, lam_max))
    beta = jnp.pi - jnp.arctan2(p_flat[..., 1], p_flat[..., 0])
    p_c = beta / (two_pi / W)
    p_r = H - row - 1.0
    r_y = jnp.ceil(3.0 * sigma / jnp.tan(jnp.abs(gap)))
    r_x = jnp.ceil(3.0 * sigma / jnp.tan(two_pi / W))
    bx, by = cfg.ref_block_x, cfg.ref_block_y
    grid_x = -(-W // bx)
    rmin_x = jnp.clip(jnp.floor((p_c - r_x) / bx), 0, grid_x)
    rmax_x = jnp.clip(jnp.floor((p_c + r_x + bx - 1) / bx), 0, grid_x)
    rmin_y = jnp.clip(_round_half_away((p_r - r_y) / by), 0, H)
    rmax_y = jnp.clip(
        jnp.maximum(_round_half_away(p_r + r_y / by),
                    _round_half_away(p_r / by) + 1), 0, H)
    validf = validf & ((rmax_x - rmin_x) * (rmax_y - rmin_y) > 0)

    # ---- cotangent accumulation (reverse order) ----
    vf = validf
    vf3 = vf[..., None]

    # conic = [c, -b, a] / det_safe, masked by zero_if(validf)
    g_conic = jnp.where(vf3, g_conic, 0.0)
    g0, g1, g2 = g_conic[..., 0], g_conic[..., 1], g_conic[..., 2]
    inv_det = 1.0 / det_safe
    g_a = g2 * inv_det
    g_b = -g1 * inv_det
    g_c = g0 * inv_det
    g_det = -(c * g0 - b * g1 + a * g2) * inv_det * inv_det
    # det = a c - b^2 (only where det > 0 did the division use det)
    g_a = g_a + g_det * c
    g_c = g_c + g_det * a
    g_b = g_b - 2.0 * b * g_det

    # a, b, c <- v1, v2, inv_d2
    g_v1 = (2.0 * g_a[..., None] * v1 + g_b[..., None] * v2) * inv_d2[..., None]
    g_v2 = (2.0 * g_c[..., None] * v2 + g_b[..., None] * v1) * inv_d2[..., None]
    g_invd2 = (g_a * (jnp.sum(v1 * v1, -1) + cfg.lowpass)
               + g_b * jnp.sum(v1 * v2, -1)
               + g_c * (jnp.sum(v2 * v2, -1) + cfg.lowpass))
    # inv_d2 = 1 / max(d^2, eps): d > near >= 0 on rows where conic grads
    # are nonzero (validf), so the max is inactive there
    g_dist = -2.0 * g_invd2 * inv_d2 / jnp.maximum(dist, 1e-12)

    # v = w * s
    g_w1 = g_v1 * scales
    g_w2 = g_v2 * scales
    g_scales = g_v1 * w1 + g_v2 * w2

    # w = R(q)^T u  ->  g_u = R(q) g_w ; g_R = u g_w^T (outer, per row)
    g_u1w = quat_rotate(quats, g_w1)
    g_u2w = quat_rotate(quats, g_w2)
    G = (u1w[..., :, None] * g_w1[..., None, :]
         + u2w[..., :, None] * g_w2[..., None, :])   # [..., 3, 3] g_Rq
    r_, x_, y_, z_ = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    G00, G01, G02 = G[..., 0, 0], G[..., 0, 1], G[..., 0, 2]
    G10, G11, G12 = G[..., 1, 0], G[..., 1, 1], G[..., 1, 2]
    G20, G21, G22 = G[..., 2, 0], G[..., 2, 1], G[..., 2, 2]
    g_qr = 2.0 * (-G01 * z_ + G02 * y_ + G10 * z_ - G12 * x_
                  - G20 * y_ + G21 * x_)
    g_qx = 2.0 * (G01 * y_ + G02 * z_ + G10 * y_ - 2 * x_ * G11
                  - r_ * G12 + G20 * z_ + r_ * G21 - 2 * x_ * G22)
    g_qy = 2.0 * (-2 * y_ * G00 + x_ * G01 + r_ * G02 + x_ * G10
                  + z_ * G12 - r_ * G20 + z_ * G21 - 2 * y_ * G22)
    g_qz = 2.0 * (-2 * z_ * G00 - r_ * G01 + x_ * G02 + r_ * G10
                  - 2 * z_ * G11 + y_ * G12 + x_ * G20 + y_ * G21)
    g_quats = jnp.stack([g_qr, g_qx, g_qy, g_qz], -1)

    # u1w = u1 @ R -> g_u1 += g_u1w @ R^T ; pose cotangent g_R += u1^T g_u1w
    g_u1 = g_u1 + jnp.matmul(g_u1w, w2s_rot.T, precision=hi)
    g_u2 = g_u2 + jnp.matmul(g_u2w, w2s_rot.T, precision=hi)

    # u2 = dirn x u1
    g_dirn = jnp.cross(u1, g_u2)
    g_u1 = g_u1 + jnp.cross(g_u2, dirn)

    # u1 = u1_raw / u1_len with the degenerate guard (both const there)
    live = ~degenerate
    g_u1m = jnp.where(live[..., None], g_u1, 0.0)
    g_u1raw = g_u1m / u1_len[..., None]
    g_u1len = -jnp.sum(g_u1m * u1, -1) / u1_len
    # u1_len = sqrt(horiz2) (live rows); horiz2 = nx^2 + ny^2
    g_h2 = jnp.where(live, 0.5 * g_u1len / u1_len, 0.0)
    # u1_raw = [ny, -nx, 0]
    g_nx = -g_u1raw[..., 1] + 2.0 * g_h2 * dirn[..., 0]
    g_ny = g_u1raw[..., 0] + 2.0 * g_h2 * dirn[..., 1]
    g_dirn = g_dirn + jnp.stack(
        [g_nx, g_ny, jnp.zeros_like(g_nx)], -1)

    # sphere_mean output
    g_dirn = g_dirn + g_mean

    # center: p_c = (pi - atan2(py, px)) * W / 2pi ;
    # p_r = H - row - 1, drow/dalpha = 1/gap (both branches);
    # alpha = atan2(pz, horiz), horiz = sqrt(px^2 + py^2)
    # (all on p_flat; constant e_x on degenerate rows)
    g_pc = g_center[..., 0]
    g_pr = g_center[..., 1]
    h2f = jnp.where(live, p_flat[..., 0] ** 2 + p_flat[..., 1] ** 2, 1.0)
    d2f = h2f + p_flat[..., 2] ** 2
    Wc = W / two_pi
    g_fx = jnp.where(live, g_pc * Wc * p_flat[..., 1] / h2f, 0.0)
    g_fy = jnp.where(live, -g_pc * Wc * p_flat[..., 0] / h2f, 0.0)
    g_alpha = -g_pr / gap
    g_fz = jnp.where(live, g_alpha * horiz / d2f, 0.0)
    g_hor = jnp.where(live, -g_alpha * p_flat[..., 2] / d2f, 0.0)
    g_fx = g_fx + jnp.where(live, g_hor * p_flat[..., 0] / horiz, 0.0)
    g_fy = g_fy + jnp.where(live, g_hor * p_flat[..., 1] / horiz, 0.0)
    g_pview = jnp.stack([g_fx, g_fy, g_fz], -1)

    # depth = where(validf, dist, sentinel)
    g_dist = g_dist + jnp.where(vf, g_depth, 0.0)

    # dirn = p_view / safe_dist: g_p += (g_dirn - dirn (dirn . g_dirn)) / d
    gd_dot = jnp.sum(g_dirn * dirn, -1)
    g_pview = g_pview + (g_dirn - dirn * gd_dot[..., None]) \
        / safe_dist[..., None]
    # dist = |p_view| (p_view is e_x on masked rows -> dist = 1, fine)
    g_pview = g_pview + g_dist[..., None] * dirn

    # p_view = where(mask2, p_view_raw, e_x)
    g_praw = jnp.where(mask2[..., None], g_pview, 0.0)

    # p_view_raw = means @ R^T + t
    g_means = jnp.matmul(g_praw, w2s_rot, precision=hi)
    lead_axes = tuple(range(g_praw.ndim - 1))
    g_t = jnp.sum(g_praw, axis=lead_axes)
    # pose rotation cotangent: p = m R^T (g_R += g_p^T m per row, i.e.
    # R_ji gets m_i g_p_j) + u1w/u2w chains (u1w_j = u1_i R_ij)
    g_R = (jnp.einsum("...j,...i->ji", g_praw, means3d)
           + jnp.einsum("...i,...j->ij", u1, g_u1w)
           + jnp.einsum("...i,...j->ij", u2, g_u2w))

    # opacity = where(validf, opacities, 0)
    g_opacities = jnp.where(vf, g_opac, 0.0)

    fl0 = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return (g_means, g_scales, g_quats, g_opacities, g_feat, fl0,
            g_R, g_t, jnp.zeros_like(beams))


preprocess_gaussians_hv.defvjp(_pg_hv_fwd, _pg_hv_bwd)


class PackedCols:
    """Column layout of the packed per-gaussian render state [P, F].

    One wide row per gaussian so that binning/compositing gathers touch a
    single contiguous 4*F-byte row instead of ~10 narrow arrays (narrow-row
    gathers are ~5x slower on TPU). rect/center/valid ride along as floats
    (pixel coords < 2^24 are exact in f32)."""

    MEAN = slice(0, 3)        # sphere_mean (unit view dir)
    U1 = slice(3, 6)          # cross-section basis 1 (unnormalized)
    U2 = slice(6, 9)
    CONIC = slice(9, 12)      # (a, b, c)
    OPACITY = 12
    DEPTH = 13
    FEAT0 = 14                # feat columns [FEAT0, FEAT0+C)

    @staticmethod
    def rect(C: int) -> slice:       # parity rect x0,x1,y0,y1
        return slice(14 + C, 18 + C)

    @staticmethod
    def center(C: int) -> slice:     # float image coords (p_c, p_r)
        return slice(18 + C, 20 + C)

    @staticmethod
    def validf(C: int) -> int:
        return 20 + C

    @staticmethod
    def width(C: int) -> int:        # padded to a multiple of 8 sublanes
        return -(-(21 + C) // 8) * 8


def pack_splats(sp: Splats) -> jnp.ndarray:
    """Splats -> packed [..., F] f32 (PackedCols layout), preserving the
    per-gaussian leading shape. Differentiable; the int fields are
    converted, not rounded (they are already integral)."""
    C = sp.feat.shape[-1]
    cols = [
        sp.sphere_mean,
        sp.u1,
        sp.u2,
        sp.conic,
        sp.opacity[..., None],
        sp.depth[..., None],
        sp.feat,
        sp.pix_rect.astype(jnp.float32),
        sp.center,
        sp.valid.astype(jnp.float32)[..., None],
    ]
    pk = jnp.concatenate(cols, axis=-1)
    pad = PackedCols.width(C) - pk.shape[-1]
    if pad:
        pk = jnp.pad(pk, [(0, 0)] * (pk.ndim - 1) + [(0, pad)])
    return pk


def visible_filter(
    anchors: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    mask: jnp.ndarray,
    w2s_rot: jnp.ndarray,
    w2s_trans: jnp.ndarray,
    beams: jnp.ndarray,
    W: int,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Anchor pre-culling: the reference's `visible_filter` / prefilter_voxel
    path (forward.cu:389-497, gaussian_renderer/__init__.py:203-257). Returns
    the `radii > 0` boolean mask."""
    P = anchors.shape[0]
    splats = preprocess_gaussians(
        anchors,
        scales,
        quats,
        jnp.ones((P,), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
        mask,
        w2s_rot,
        w2s_trans,
        beams,
        W,
        cfg,
    )
    return splats.valid
