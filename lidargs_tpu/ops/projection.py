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
