"""Failure snapshots: dump the full render/training input state on
non-finite losses.

The reference wraps every rasterizer call and, on a CUDA exception, pickles
all kernel inputs to disk for offline repro
(diff_lidargs_rasterization/diff_lidargs_rasterization/__init__.py:84-96).
Here the renderer cannot throw (pure XLA) — the failure signature is a
non-finite loss/metric — so the training loop calls `snapshot_if_nonfinite`
at its existing host sync point. Because every kernel in this repo is
deterministic, re-rendering the dumped state reproduces the bad values
exactly: `load_render_snapshot` + one `render_field` call is the offline
repro the reference's mechanism buys with pickling.
"""
from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np

from ..lidar.frames import LidarFrame

_FRAME_FIELDS = ("w2s_rot", "w2s_trans", "center", "beams", "gt_image",
                 "uid", "pixel_mask")


def _flatten(prefix: str, tree: dict, out: dict) -> None:
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            _flatten(key, v, out)
        elif v is not None:
            out[key] = np.asarray(v)


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def dump_render_snapshot(path: str, params: dict, valid, frame: LidarFrame,
                         extra: Optional[dict] = None) -> str:
    """All render inputs -> one npz (the reference's snapshot_to_file)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat: dict = {}
    _flatten("params", params, flat)
    flat["valid"] = np.asarray(valid)
    _flatten("frame", {f: getattr(frame, f) for f in _FRAME_FIELDS}, flat)
    _flatten("extra", extra or {}, flat)
    np.savez_compressed(path, **flat)
    return path


def load_render_snapshot(path: str) -> Tuple[dict, np.ndarray, LidarFrame,
                                             dict]:
    """-> (params, valid, LidarFrame, extra) ready to re-render."""
    archive = np.load(path)
    tree = _unflatten({k: archive[k] for k in archive.files})
    fr = tree.get("frame", {})
    frame = LidarFrame(**{f: fr.get(f) for f in _FRAME_FIELDS})
    return tree.get("params", {}), tree["valid"], frame, tree.get("extra", {})


def snapshot_if_nonfinite(loss: float, model_path: str, iteration: int,
                          params: dict, valid, frame: LidarFrame,
                          logger=None) -> Optional[str]:
    """If `loss` is NaN/inf, dump the render inputs under
    <model_path>/debug/nonfinite_iter<it>.npz and return the path."""
    if math.isfinite(loss):
        return None
    path = os.path.join(model_path, "debug", f"nonfinite_iter{iteration}.npz")
    dump_render_snapshot(path, params, valid, frame,
                         extra={"iteration": np.int64(iteration),
                                "loss": np.float64(loss)})
    if logger is not None:
        logger.error(
            f"iter {iteration}: NON-FINITE loss {loss} — render inputs "
            f"snapshotted to {path} (deterministic offline repro: "
            f"utils.debug.load_render_snapshot + render_field)"
        )
    return path
