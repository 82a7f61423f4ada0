"""Nearest-neighbour ops: simple-knn and chamfer-3D equivalents.

The reference depends on two CUDA extensions here: `simple_knn.distCUDA2`
(mean squared distance to the 3 nearest neighbours, used for voxel-size and
initial-scale estimation, gaussian_model.py:286,302) and a brute-force
chamfer kernel (`extern/chamfer3D/chamfer3D.cu`, used for eval CD/F-score,
utils/lidar_utils.py:261-279).

TPU-native design: squared distances via the Gram matrix
|x-y|^2 = |x|^2 + |y|^2 - 2 x.y so the O(N*M) work runs on the MXU, chunked
over rows to bound memory; top-k on the negated row blocks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def _chunk_knn_sqdist(chunk: jnp.ndarray, pts: jnp.ndarray, k: int):
    """[B,3] vs [N,3] -> k smallest squared distances per row (excluding
    nothing; caller handles self-matches)."""
    hi = jax.lax.Precision.HIGHEST
    d2 = (
        jnp.sum(chunk * chunk, -1, keepdims=True)
        + jnp.sum(pts * pts, -1)[None, :]
        - 2.0 * jnp.matmul(chunk, pts.T, precision=hi)
    )
    neg_top, _ = jax.lax.top_k(-d2, k)
    return -neg_top  # [B, k] ascending


def knn_sqdist(queries, points, k: int, chunk: int = 4096, exclude_self: bool = False):
    """k smallest squared distances from each query to `points`. Host-facing:
    accepts numpy/jax, returns jnp [Nq, k]."""
    q = jnp.asarray(queries, jnp.float32)
    p = jnp.asarray(points, jnp.float32)
    n = q.shape[0]
    kk = k + 1 if exclude_self else k
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    blocks = qp.reshape(-1, chunk, 3)
    out = jax.lax.map(lambda b: _chunk_knn_sqdist(b, p, kk), blocks)
    out = out.reshape(-1, kk)[:n]
    if exclude_self:
        out = out[:, 1:]  # drop the zero self-distance
    return out


def mean_sq_dist_3nn(points: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """distCUDA2 equivalent: mean squared distance to the 3 nearest
    neighbours of each point within its own set."""
    d2 = knn_sqdist(points, points, k=3, chunk=chunk, exclude_self=True)
    return np.asarray(jnp.mean(jnp.maximum(d2, 0.0), axis=1))


@partial(jax.jit, static_argnames=("chunk",))
def _chamfer_dir(a: jnp.ndarray, a_valid: jnp.ndarray, b: jnp.ndarray,
                 b_valid: jnp.ndarray, chunk: int = 4096):
    """min_j |a_i - b_j|^2 for every valid a_i (invalid b rows excluded)."""
    hi = jax.lax.Precision.HIGHEST
    n = a.shape[0]
    pad = (-n) % chunk
    ap = jnp.pad(a, ((0, pad), (0, 0)))
    avp = jnp.pad(a_valid, (0, pad))
    b2 = jnp.sum(b * b, -1)

    def one(block):
        blk, _ = block
        d2 = (
            jnp.sum(blk * blk, -1, keepdims=True)
            + b2[None, :]
            - 2.0 * jnp.matmul(blk, b.T, precision=hi)
        )
        d2 = jnp.where(b_valid[None, :], d2, jnp.inf)
        return jnp.min(d2, axis=1)

    mins = jax.lax.map(one, (ap.reshape(-1, chunk, 3), avp.reshape(-1, chunk)))
    mins = mins.reshape(-1)[:n]
    return jnp.where(a_valid, jnp.maximum(mins, 0.0), 0.0)


def chamfer_distance(pred: np.ndarray, gt: np.ndarray, chunk: int = 4096,
                     capacity: int = None):
    """Bidirectional mean squared chamfer distance + per-point squared
    distances (chamfer_3DFunction semantics). Returns (cd, d1, d2, v1, v2).

    `capacity`: pad both clouds to this STATIC size (validity-masked) so
    per-frame point counts don't trigger a recompile — pano_to_lidar
    returns a different length every frame, and an uncached compile costs
    ~45 s through the remote-TPU tunnel (measured: a 46-frame eval sweep
    appeared hung). Pass e.g. H*W from the eval loop."""
    a = np.asarray(pred, np.float32)
    b = np.asarray(gt, np.float32)
    na, nb = a.shape[0], b.shape[0]
    if capacity is not None:
        if max(na, nb) > capacity:
            raise ValueError(f"{max(na, nb)} points exceed capacity {capacity}")
        a = np.pad(a, ((0, capacity - na), (0, 0)))
        b = np.pad(b, ((0, capacity - nb), (0, 0)))
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    av = jnp.arange(a.shape[0]) < na
    bv = jnp.arange(b.shape[0]) < nb
    d1 = _chamfer_dir(a, av, b, bv, chunk)
    d2 = _chamfer_dir(b, bv, a, av, chunk)
    cd = jnp.sum(d1) / jnp.maximum(na, 1) + jnp.sum(d2) / jnp.maximum(nb, 1)
    return float(cd), d1, d2, av, bv


def fscore(d1, d2, threshold: float = 0.05, v1=None, v2=None):
    """F-score at tau (extern/fscore.py:4-18): precision/recall from the
    *squared* chamfer distances, matching the reference's usage. v1/v2:
    optional validity masks for capacity-padded inputs."""
    if v1 is None:
        v1 = jnp.ones(d1.shape, bool)
    if v2 is None:
        v2 = jnp.ones(d2.shape, bool)
    precision_1 = jnp.sum((d1 < threshold) & v1) / jnp.maximum(jnp.sum(v1), 1)
    precision_2 = jnp.sum((d2 < threshold) & v2) / jnp.maximum(jnp.sum(v2), 1)
    denom = precision_1 + precision_2
    f = jnp.where(denom > 0, 2 * precision_1 * precision_2 / jnp.maximum(denom, 1e-20), 0.0)
    return float(f), float(precision_1), float(precision_2)
