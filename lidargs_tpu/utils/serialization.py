"""Pytree <-> npz (de)serialization for checkpoints.

The reference has two formats — PLY+MLP snapshots and a torch.save capture
whose restore path is broken as released (gaussian_model.py:169-197). Here
both snapshot and full-resume states are flat npz archives keyed by pytree
path: dependency-light, deterministic, and loadable without the model code.
"""
from __future__ import annotations

import numpy as np
import jax


def _path_str(path) -> str:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        else:
            out.append(str(p))
    return "/".join(out)


def save_pytree_npz(path: str, tree) -> None:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    np.savez_compressed(
        path, **{_path_str(p): np.asarray(v) for p, v in leaves}
    )


def load_pytree_npz(path: str, like):
    """Restore into the structure of `like` (names must match)."""
    archive = np.load(path)
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, ref in paths:
        key = _path_str(p)
        if key not in archive:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = archive[key]
        leaves.append(np.asarray(arr, dtype=np.asarray(ref).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
