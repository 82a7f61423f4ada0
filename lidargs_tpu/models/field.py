"""Neural Gaussian Field: Scaffold-GS-style anchors + view-conditioned heads.

TPU-native re-design of the reference's GaussianModel + neural gaussian
generation (`scene/gaussian_model.py:30-141`,
`gaussian_renderer/__init__.py:17-119`). Key differences from the torch
design, forced by XLA static shapes:

  * anchor arrays are padded to a static capacity with a `valid` mask;
    densify/prune edits rows in place instead of re-allocating tensors.
  * no boolean compaction of decoded gaussians: every anchor decodes its
    k offsets every step; the opacity>0 / visibility masks flow into the
    rasterizer's validity bit. Redundant FLOPs on invalid rows buy fully
    static shapes (and the decode is one big MXU matmul anyway).

Semantics preserved exactly: per-anchor view direction + distance
conditioning, tanh opacity / sigmoid intensity / sigmoid raydrop heads,
7-dim cov head split into sigmoid-modulated scales + normalized quaternion,
xyz = anchor + offset * exp(scaling[:, :3]).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, RasterConfig
from ..lidar.frames import LidarFrame
from ..ops.projection import (
    Splats,
    preprocess_gaussians,
    preprocess_gaussians_hv,
    visible_filter,
)
from ..ops.rasterize import RenderOut, render_tiled
from .mlp import apply_mlp, init_mlp


class AnchorField(NamedTuple):
    """Static-capacity anchor state. `params` entries are trainable."""

    params: dict                 # anchor/offset/feat/scaling/rotation/opacity + mlp_*
    valid: jnp.ndarray           # [C] bool anchor liveness
    voxel_size: float            # python float (static)


def mlp_input_dims(cfg: ModelConfig, num_cameras: int = 0) -> dict:
    """Head input widths. The appearance rows exist only when an appearance
    embedding will actually be created (appearance_dim > 0 AND there are
    cameras to index it) — otherwise the color/raydrop heads would expect
    inputs nothing supplies (ADVICE r2)."""
    d_op = cfg.feat_dim + 3 + (1 if cfg.add_opacity_dist else 0)
    d_cov = cfg.feat_dim + 3 + (1 if cfg.add_cov_dist else 0)
    app = cfg.appearance_dim if (cfg.appearance_dim > 0 and num_cameras > 0) else 0
    d_col = cfg.feat_dim + 3 + (1 if cfg.add_color_dist else 0) + app
    return {"opacity": d_op, "cov": d_cov, "color": d_col, "raydrop": d_col}


def init_field_params(key, cfg: ModelConfig, num_cameras: int = 0) -> dict:
    """MLP heads + empty anchor arrays at capacity (gaussian_model.py:104-141,
    199-202)."""
    C = cfg.anchor_capacity
    dims = mlp_input_dims(cfg, num_cameras)
    keys = jax.random.split(key, 8)
    params = {
        "anchor": jnp.zeros((C, 3), jnp.float32),
        "offset": jnp.zeros((C, cfg.n_offsets, 3), jnp.float32),
        "feat": jnp.zeros((C, cfg.feat_dim), jnp.float32),
        "scaling": jnp.zeros((C, 6), jnp.float32),       # log-scale
        "rotation": jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (C, 1)),
        "opacity": jnp.zeros((C, 1), jnp.float32),       # frozen (inverse-sigmoid)
        "mlp_opacity": init_mlp(keys[0], dims["opacity"], cfg.mlp_hidden, cfg.n_offsets),
        "mlp_cov": init_mlp(keys[1], dims["cov"], cfg.mlp_hidden, 7 * cfg.n_offsets),
        "mlp_color": init_mlp(
            keys[2], dims["color"], cfg.mlp_hidden, (cfg.color_channel - 1) * cfg.n_offsets
        ),
        "mlp_raydrop": init_mlp(keys[3], dims["color"], cfg.mlp_hidden, cfg.n_offsets),
    }
    if cfg.use_feat_bank:
        params["mlp_featbank"] = init_mlp(keys[4], 4, cfg.mlp_hidden, 3)
    if cfg.appearance_dim > 0 and num_cameras > 0:
        # torch nn.Embedding default init: N(0, 1)
        params["appearance"] = jax.random.normal(
            keys[5], (num_cameras, cfg.appearance_dim), jnp.float32
        )
        params["appearance_rd"] = jax.random.normal(
            keys[6], (num_cameras, cfg.appearance_dim), jnp.float32
        )
    return params


def voxelize_points(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Unique voxel-rounded sample (gaussian_model.py:272-276). Hash-set
    based in C++ when the native library is available (native/)."""
    from ..native import voxel_unique

    return voxel_unique(points, voxel_size)


def init_field_from_points(
    key,
    cfg: ModelConfig,
    points: np.ndarray,
    voxel_size: Optional[float] = None,
    num_cameras: int = 0,
) -> AnchorField:
    """create_from_pcd semantics (gaussian_model.py:278-317): voxelize the
    init cloud (voxel size = median 3-NN distance if unset), log sqrt mean
    3-NN sq-distance as initial scales, identity rotations, opacity 0.5."""
    from ..ops.knn import mean_sq_dist_3nn

    points = np.asarray(points, np.float64)[:: cfg.ratio]
    vs = cfg.voxel_size if voxel_size is None else voxel_size
    if vs <= 0:
        d2 = mean_sq_dist_3nn(points.astype(np.float32))
        vs = float(np.median(d2))
    anchors = voxelize_points(points, vs).astype(np.float32)
    n = anchors.shape[0]
    if n > cfg.anchor_capacity:
        raise ValueError(
            f"{n} anchors exceed capacity {cfg.anchor_capacity}; raise "
            "ModelConfig.anchor_capacity"
        )
    d2 = np.maximum(mean_sq_dist_3nn(anchors), 1e-7)
    scales = np.repeat(np.log(np.sqrt(d2))[:, None], 6, axis=1).astype(np.float32)

    params = init_field_params(key, cfg, num_cameras)
    C = cfg.anchor_capacity
    params["anchor"] = params["anchor"].at[:n].set(jnp.asarray(anchors))
    params["scaling"] = params["scaling"].at[:n].set(jnp.asarray(scales))
    inv_sig_half = float(np.log(0.5 / 0.5))  # inverse_sigmoid(0.5) = 0
    params["opacity"] = params["opacity"].at[:n].set(inv_sig_half)
    valid = jnp.arange(C) < n
    return AnchorField(params=params, valid=valid, voxel_size=vs)


class NeuralGaussians(NamedTuple):
    """Decoded per-view gaussians, anchor-major [C, k, ...].

    The anchor-major shape is load-bearing for TPU performance: collapsing
    to [C*k, x] (x = 3/4/7) INSIDE the decode epilogue forces a relayout
    per array (the (k, x) minor dims re-tile) and breaks XLA fusion —
    measured +1.8 ms/frame at bench scale (r5, tools/bench_front_ab.py).
    The decode stays [C, k, ...]; render_field pays the one flatten at the
    projection boundary, the cheapest measured place for it (DESIGN §13:
    flattening the six narrow decode outputs 3.4 ms upto-cull vs 6.6 ms
    for relayouting packed [C,k,F] rows after projection)."""

    xyz: jnp.ndarray         # [C, k, 3]
    feat: jnp.ndarray        # [C, k, channels] (intensity..., raydrop)
    opacity: jnp.ndarray     # [C, k] raw tanh output (rasterizer opacity)
    scaling: jnp.ndarray     # [C, k, 3] cov scales (activated)
    rot: jnp.ndarray         # [C, k, 4] normalized
    mask: jnp.ndarray        # [C, k] anchor-valid & visible & opacity>0
    neural_opacity: jnp.ndarray  # [C, k] pre-mask (densification stats)
    sel_mask: jnp.ndarray    # [C, k] opacity>0 & visible (reference's
                             # offset_selection_mask over visible anchors)


def generate_neural_gaussians(
    params: dict,
    valid: jnp.ndarray,
    anchor_visible: jnp.ndarray,   # [C] prefilter mask
    cam_center: jnp.ndarray,       # [3]
    cfg: ModelConfig,
    cam_uid: Optional[jnp.ndarray] = None,
) -> NeuralGaussians:
    """Decode every anchor's k neural gaussians for this view
    (gaussian_renderer/__init__.py:17-119), masked instead of compacted."""
    k = cfg.n_offsets
    anchor = params["anchor"]
    Cap = anchor.shape[0]

    ob_view = anchor - cam_center
    # double-where: padded anchors can coincide with the sensor origin and
    # norm(0) has NaN gradients even though the rows are masked downstream
    d2 = jnp.sum(ob_view * ob_view, axis=1, keepdims=True)
    ok = d2 > 0.0
    ob_dist = jnp.sqrt(jnp.where(ok, d2, 1.0))
    ob_view = jnp.where(ok, ob_view, 0.0) / ob_dist

    feat = params["feat"]
    if cfg.use_feat_bank:
        bank_w = apply_mlp(
            params["mlp_featbank"],
            jnp.concatenate([ob_view, ob_dist], 1),
            final_act=lambda y: jax.nn.softmax(y, axis=1),
        )
        # multi-resolution mixing (gaussian_renderer/__init__.py:43-47)
        feat = (
            jnp.tile(feat[:, ::4], (1, 4)) * bank_w[:, :1]
            + jnp.tile(feat[:, ::2], (1, 2)) * bank_w[:, 1:2]
            + feat * bank_w[:, 2:]
        )

    cat = jnp.concatenate([feat, ob_view, ob_dist], 1)
    cat_nodist = jnp.concatenate([feat, ob_view], 1)

    heads_fusable = (
        cfg.add_opacity_dist == cfg.add_color_dist == cfg.add_cov_dist
        and not (cfg.appearance_dim > 0 and "appearance" in params)
    )
    if heads_fusable:
        # all four heads read the SAME input: run their l1/l2 as two fused
        # GEMMs (weights concatenated on the fly — the param pytree and the
        # per-output dot products are unchanged, so results are identical;
        # 8 small matmul launches collapse to 2 MXU calls)
        x = cat if cfg.add_opacity_dist else cat_nodist
        names = ("mlp_opacity", "mlp_color", "mlp_raydrop", "mlp_cov")
        w1 = jnp.concatenate([params[n]["l1"]["w"] for n in names], axis=1)
        b1 = jnp.concatenate([params[n]["l1"]["b"] for n in names])
        h = jax.nn.relu(x @ w1 + b1)
        Hd = params["mlp_opacity"]["l1"]["w"].shape[1]
        outs = []
        for i, n in enumerate(names):
            hi = h[:, i * Hd : (i + 1) * Hd]
            outs.append(hi @ params[n]["l2"]["w"] + params[n]["l2"]["b"])
        neural_op = jnp.tanh(outs[0])                              # [C,k]
        intensity = jax.nn.sigmoid(outs[1])
        raydrop = jax.nn.sigmoid(outs[2])
        scale_rot = outs[3].reshape(Cap, k, 7)
        intensity = intensity.reshape(Cap, k, cfg.color_channel - 1)
        raydrop = raydrop.reshape(Cap, k, 1)
        color = jnp.concatenate([intensity, raydrop], -1)
    else:
        op_in = cat if cfg.add_opacity_dist else cat_nodist
        neural_op = apply_mlp(params["mlp_opacity"], op_in, final_act=jnp.tanh)  # [C,k]

        col_in = cat if cfg.add_color_dist else cat_nodist
        if cfg.appearance_dim > 0 and "appearance" in params:
            app = jnp.broadcast_to(params["appearance"][cam_uid], (Cap, cfg.appearance_dim))
            app_rd = jnp.broadcast_to(params["appearance_rd"][cam_uid], (Cap, cfg.appearance_dim))
            col_in_c = jnp.concatenate([col_in, app], 1)
            col_in_r = jnp.concatenate([col_in, app_rd], 1)
        else:
            col_in_c = col_in_r = col_in
        intensity = apply_mlp(params["mlp_color"], col_in_c, final_act=jax.nn.sigmoid)
        raydrop = apply_mlp(params["mlp_raydrop"], col_in_r, final_act=jax.nn.sigmoid)
        intensity = intensity.reshape(Cap, k, cfg.color_channel - 1)
        raydrop = raydrop.reshape(Cap, k, 1)
        color = jnp.concatenate([intensity, raydrop], -1)

        cov_in = cat if cfg.add_cov_dist else cat_nodist
        scale_rot = apply_mlp(params["mlp_cov"], cov_in).reshape(Cap, k, 7)

    # anchor-major epilogue: [C, 1, x] broadcasts instead of [C*k, x]
    # repeats (see the NeuralGaussians docstring for the measured why)
    scaling_all = jnp.exp(params["scaling"])                       # [C,6]
    scaling = scaling_all[:, None, 3:] * jax.nn.sigmoid(scale_rot[..., :3])
    q = scale_rot[..., 3:7]
    qn2 = jnp.sum(q * q, axis=-1, keepdims=True)
    rot = jnp.where(qn2 > 0, q, jnp.array([1.0, 0, 0, 0])) / jnp.sqrt(
        jnp.where(qn2 > 0, qn2, 1.0)
    )

    xyz = anchor[:, None, :] + params["offset"] * scaling_all[:, None, :3]

    vis = (valid & anchor_visible)[:, None]                        # [C,1]
    sel = neural_op > 0.0                                          # [C,k]
    mask = vis & sel
    return NeuralGaussians(
        xyz=xyz,
        feat=color,
        opacity=neural_op,
        scaling=scaling,
        rot=rot,
        mask=mask,
        neural_opacity=neural_op,
        sel_mask=sel & vis,
    )


def prefilter_anchors(
    field_params: dict,
    valid: jnp.ndarray,
    frame: LidarFrame,
    rcfg: RasterConfig,
) -> jnp.ndarray:
    """prefilter_voxel (gaussian_renderer/__init__.py:203-257): project raw
    anchors with their offset-scales (scaling[:, :3]) and keep radii > 0."""
    scales = jnp.exp(field_params["scaling"][:, :3])
    q = field_params["rotation"]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return visible_filter(
        field_params["anchor"], scales, q, valid,
        frame.w2s_rot, frame.w2s_trans, frame.beams, frame.W, rcfg,
    )


def _maybe_remat(fn, rcfg: RasterConfig):
    """Wrap the projection in jax.checkpoint when rcfg.remat_projection —
    recompute it in the backward instead of storing residuals (measured
    win only at beam h4/K768, see config.py)."""
    return jax.checkpoint(fn) if rcfg.remat_projection else fn


def render_field(
    params: dict,
    valid: jnp.ndarray,
    frame: LidarFrame,
    mcfg: ModelConfig,
    rcfg: RasterConfig,
    bg: jnp.ndarray,
    sphere_proxy: Optional[jnp.ndarray] = None,
    tile_spec=None,
):
    """Full render path: prefilter -> decode -> preprocess -> tiled splat
    (the reference's train-loop body, train.py:144-146).

    `sphere_proxy` is a zeros [C, k, 3] tensor added to the unit-sphere
    means; its gradient is the densification signal (the reference reads
    viewspace_points.grad[:, 2:], gaussian_model.py:617-619).

    With `rcfg.visible_anchor_cap > 0` (render/eval path), the prefiltered
    anchors are compacted to that static capacity before the decode — the
    decode/projection/cull then run on the ~visible subset, the closest
    TPU analogue of the reference decoding only `anchor[visible_mask]`
    (gaussian_renderer/__init__.py:25-34; dynamic shapes there, a static
    capacity + permutation gather here). Anchors beyond the cap are
    counted into n_dropped. Incompatible with the densification proxy
    (stats index the full anchor table)."""
    anchor_visible = prefilter_anchors(params, valid, frame, rcfg)
    Ca = rcfg.visible_anchor_cap
    n_anchor_drop = None
    if Ca and Ca > 0:
        if sphere_proxy is not None:
            raise ValueError(
                "visible_anchor_cap is a render/eval-path optimization; the "
                "training step's densification proxy needs the full table"
            )
        import jax as _jax

        from ..ops.rasterize import permutation_rows

        C = params["anchor"].shape[0]
        Ca = min(Ca, C)
        vis = valid & anchor_visible
        # stable sort by (!visible): visible anchors first, order preserved
        _, order = _jax.lax.sort(
            ((~vis).astype(jnp.int32), jnp.arange(C, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        n_vis = jnp.sum(vis)
        n_anchor_drop = jnp.maximum(n_vis - Ca, 0)
        sub = dict(params)
        for name in ("anchor", "offset", "feat", "scaling", "rotation",
                     "opacity"):
            sub[name] = permutation_rows(params[name], order, Ca)
        sub_on = jnp.arange(Ca) < jnp.minimum(n_vis, Ca)
        params, valid, anchor_visible = sub, sub_on, sub_on
    ng = generate_neural_gaussians(
        params, valid, anchor_visible, frame.center, mcfg, cam_uid=frame.uid
    )

    # hand-derived single-pass projection VJP when enabled (see
    # RasterConfig.projection_hand_vjp); remat wraps the plain function
    # (checkpoint already stores inputs only)
    _pg = (preprocess_gaussians_hv
           if rcfg.projection_hand_vjp and not rcfg.remat_projection
           else preprocess_gaussians)

    def _proj(xyz, scaling, rot, opacity, feat, mask):
        return _pg(
            xyz, scaling, rot, opacity, feat, mask,
            frame.w2s_rot, frame.w2s_trans, frame.beams, frame.W, rcfg,
        )

    # Flatten the anchor-major decode HERE, at the projection boundary —
    # measured (r5 on-chip pack A/B -> DESIGN §13) as the cheapest place to
    # pay the one [C,k,.]->[C*k,.] relayout: flattening the six narrow
    # decode outputs (upto-cull prefix 3.4 ms) beats relayouting the packed
    # [C,k,F] rows after projection (6.6 ms) or flattening inside the pack
    # concat (4.1 ms) at bench scale.
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    splats = _maybe_remat(_proj, rcfg)(
        flat(ng.xyz), flat(ng.scaling), flat(ng.rot),
        flat(ng.opacity), flat(ng.feat), flat(ng.mask)
    )
    if sphere_proxy is not None:
        splats = splats._replace(
            sphere_mean=splats.sphere_mean + sphere_proxy.reshape(-1, 3))
    out = render_tiled(splats, frame.beams, frame.W, bg, rcfg, tile_spec=tile_spec)
    if n_anchor_drop is not None:
        out = out._replace(n_dropped=out.n_dropped
                           + n_anchor_drop * mcfg.n_offsets)
    return out, ng, anchor_visible


def render_field_surfel(
    params: dict,
    valid: jnp.ndarray,
    frame: LidarFrame,
    mcfg: ModelConfig,
    rcfg: RasterConfig,
    bg: jnp.ndarray,
    mean_proxy: Optional[jnp.ndarray] = None,
):
    """Surfel (2DGS) render path: the same Neural Gaussian Field decode, but
    the first two decoded covariance scales parameterize a 2D surfel whose
    third local axis is its normal (the reference's alternative
    diff_lidargs_surfel_rasterization backend, readme.md:42; its Python glue
    was never released, so the decode mirrors the 3DGS-variant renderer,
    gaussian_renderer/__init__.py:17-119, with scaling[:, :2])."""
    from ..ops.surfel import preprocess_surfels, render_surfels

    anchor_visible = prefilter_anchors(params, valid, frame, rcfg)
    ng = generate_neural_gaussians(
        params, valid, anchor_visible, frame.center, mcfg, cam_uid=frame.uid
    )
    xyz = ng.xyz if mean_proxy is None else ng.xyz + mean_proxy

    def _proj(xyz_, scaling, rot, opacity, feat, mask):
        return preprocess_surfels(
            xyz_, scaling, rot, opacity, feat, mask,
            frame.w2s_rot, frame.w2s_trans, frame.beams, frame.W, rcfg,
        )

    # the surfel preprocess/pack keeps the flat [P, ...] contract for now —
    # flatten the anchor-major decode here (the beam path's relayout win is
    # staged for the surfel kernels separately)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    pk = _maybe_remat(_proj, rcfg)(
        flat(xyz), flat(ng.scaling)[:, :2], flat(ng.rot),
        flat(ng.opacity), flat(ng.feat), flat(ng.mask))
    out = render_surfels(pk, frame.beams, frame.W, bg, rcfg, C=ng.feat.shape[-1])
    return out, ng, anchor_visible
