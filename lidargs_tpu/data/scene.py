"""Scene orchestration: dataset -> frames + anchor field, checkpoint I/O.

The analogue of the reference's Scene (scene/__init__.py:21-97): loads the
dataset, initializes the Neural Gaussian Field from the fused point cloud,
and owns save/load of model snapshots. Unlike the reference (whose mid-run
capture/restore is broken, gaussian_model.py:169-197), full-resume state
round-trips through one npz.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dfield
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig
from ..lidar.frames import LidarFrame
from ..models.field import AnchorField, init_field_from_points, init_field_params
from ..utils.serialization import load_pytree_npz, save_pytree_npz
from .ply import read_anchor_model, write_anchor_model, write_point_cloud
from .waymo import SceneData, read_lidar_scene


_MLP_KEYS = (
    "mlp_opacity", "mlp_cov", "mlp_color", "mlp_raydrop",
    "mlp_featbank", "appearance", "appearance_rd",
)


@dataclass
class Scene:
    data: SceneData
    field: AnchorField
    model_path: str

    @classmethod
    def create(
        cls,
        cfg: TrainConfig,
        load_iteration: Optional[int] = None,
        seed: int = 0,
        init_ply: Optional[str] = None,
    ) -> "Scene":
        """`init_ply`: initialize the anchor cloud from a saved PLY instead
        of the fused back-projected frames — the --warmup second-phase
        restart (train.py:635-638 / scene/__init__.py ply_path)."""
        data = read_lidar_scene(
            cfg.data.source_path,
            data_label=cfg.data.data_label,
            num_frames=cfg.data.num_frames,
            init_samples=cfg.data.init_points,
            seed=seed,
        )
        os.makedirs(cfg.model_path, exist_ok=True)
        if load_iteration is not None:
            field = cls._load_field(cfg.model_path, load_iteration, cfg.model)
        else:
            if init_ply is not None:
                from .ply import read_anchor_model, read_point_cloud

                try:
                    init_points = read_anchor_model(init_ply)[0]
                except Exception:
                    init_points = read_point_cloud(init_ply)
            else:
                init_points = data.init_points
                write_point_cloud(
                    os.path.join(cfg.model_path, "points3d.ply"), init_points
                )
            field = init_field_from_points(
                jax.random.key(cfg.seed),
                cfg.model,
                init_points,
                num_cameras=len(data.train_frames),
            )
        return cls(data=data, field=field, model_path=cfg.model_path)

    # --- model snapshots (reference scene.save: PLY + MLP ckpts) ---

    def save(self, params: dict, valid, iteration: int) -> str:
        out_dir = os.path.join(
            self.model_path, "point_cloud", f"iteration_{iteration}"
        )
        os.makedirs(out_dir, exist_ok=True)
        mask = np.asarray(valid)
        write_anchor_model(
            os.path.join(out_dir, "point_cloud.ply"),
            *(np.asarray(params[k])[mask] for k in
              ("anchor", "offset", "feat", "scaling", "rotation", "opacity")),
        )
        mlps = {k: params[k] for k in _MLP_KEYS if k in params}
        save_pytree_npz(os.path.join(out_dir, "mlp_checkpoints.npz"), mlps)
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump({"voxel_size": self.field.voxel_size,
                       "n_anchors": int(mask.sum())}, f)
        return out_dir

    @staticmethod
    def _load_field(model_path: str, iteration: int, mcfg: ModelConfig) -> AnchorField:
        out_dir = os.path.join(model_path, "point_cloud", f"iteration_{iteration}")
        anchor, offset, feat, scaling, rotation, opacity = read_anchor_model(
            os.path.join(out_dir, "point_cloud.ply")
        )
        with open(os.path.join(out_dir, "meta.json")) as f:
            meta = json.load(f)
        n = anchor.shape[0]
        if n > mcfg.anchor_capacity:
            raise ValueError(f"snapshot has {n} anchors > capacity")
        params = init_field_params(jax.random.key(0), mcfg)
        C = mcfg.anchor_capacity
        for name, arr in (
            ("anchor", anchor), ("offset", offset), ("feat", feat),
            ("scaling", scaling), ("rotation", rotation), ("opacity", opacity),
        ):
            params[name] = params[name].at[:n].set(jnp.asarray(arr))
        mlps_like = {k: params[k] for k in _MLP_KEYS if k in params}
        mlps = load_pytree_npz(os.path.join(out_dir, "mlp_checkpoints.npz"), mlps_like)
        params.update(jax.tree.map(jnp.asarray, mlps))
        valid = jnp.arange(C) < n
        return AnchorField(params=params, valid=valid,
                           voxel_size=meta["voxel_size"])

    # --- full-resume checkpoints (fixes the reference's broken restore) ---

    def save_train_state(self, state, iteration: int) -> str:
        path = os.path.join(self.model_path, f"chkpnt{iteration}.npz")
        save_pytree_npz(path, state)
        return path

    def load_train_state(self, iteration: int, like):
        path = os.path.join(self.model_path, f"chkpnt{iteration}.npz")
        tree = load_pytree_npz(path, like)
        return jax.tree.map(jnp.asarray, tree)
