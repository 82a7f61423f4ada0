"""Dynamic Waymo scenes (DyNFL preprocessing) — static/dynamic decomposition.

TPU-native re-design of the reference's partially-released dynamic mode
(`scene/waymoDynamic.py` + `scene/dataset_readers_dynmaic.py`; the README
marks it "not been updated yet", readme.md:40, and the released code has a
unicode syntax error at dataset_readers_dynmaic.py:121 plus a call-signature
mismatch vs scene/__init__.py:50 — both fixed here, not reproduced).

Input bundle (per driving context, produced by DyNFL's preprocessing):
  range_images1.npy            [N, H, W, 3]  (dist, intensity, elongation)
  ray_object_indices.npy       [N, H, W]     per-ray object index (-1 = bg)
  normals.npy                  [N, H, W, 3]
  ray_origins.npy / ray_dirs.npy
  valid_normal_flags.npy       [N, H, W]
  objects_id_2_{tsfm,corners,anchors,frameidx,dynamic_flag}.npy  (dict pickles)
  object_ids_per_frame.npy / objects_id_types_per_frame.npy
  training_lidar_calibration.parquet   (beam inclinations, row 4)
  meta_info.json               frames[i+50].lidar2world poses

Decomposition: model_id == STATIC renders the background (all dynamic
vehicles masked out); each dynamic vehicle id becomes its own canonical
object frame via a Kabsch fit of its first-occurrence box corners against
an axis-aligned anchor box (waymoDynamic.py:172-244).
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from ..lidar.frames import LidarFrame
from ..native import pano_to_points

STATIC = 0          # pseudo model id of the background scene
VEHICLE_TYPE = 1    # waymo object type "vehicle"


def kabsch(x1: np.ndarray, x2: np.ndarray,
           weights: Optional[np.ndarray] = None,
           eps: float = 1e-7) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted Kabsch/Umeyama rigid fit x2 ~ R @ x1 + t
    (kabsch_transformation_estimation, waymoDynamic.py:172-221)."""
    n = x1.shape[0]
    w = np.ones((n,)) if weights is None else np.asarray(weights, np.float64)
    w = w / (w.sum() + eps)
    m1 = (w[:, None] * x1).sum(0)
    m2 = (w[:, None] * x2).sum(0)
    a = (x1 - m1) * w[:, None]
    cov = a.T @ (x2 - m2)
    u, _, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    R = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    t = m2 - R @ m1
    return R, t


class WaymoDynamicScene:
    """Loader over the DyNFL-preprocessed context directory."""

    def __init__(self, context_dir: str, scene_size: int = 50,
                 frame_offset: int = 50, calib_row: int = 4):
        d = Path(context_dir)
        self.scene_size = scene_size

        ri = np.load(d / "range_images1.npy", allow_pickle=True)
        ri = np.asarray(ri, np.float32)[:scene_size]
        self.first_dist = ri[..., 0]                      # [N, H, W]
        self.first_intensity = np.tanh(ri[..., 1])
        self.first_elongation = ri[..., 2]
        self.first_masks = self.first_dist > 0

        self.ray_object_indices = np.load(
            d / "ray_object_indices.npy", allow_pickle=True)[:scene_size]
        self.normals = np.asarray(
            np.load(d / "normals.npy", allow_pickle=True), np.float32)[:scene_size]
        self.valid_normal_flag = np.load(
            d / "valid_normal_flags.npy", allow_pickle=True)[:scene_size]
        self.objects_id_2_tsfm = np.load(
            d / "objects_id_2_tsfm.npy", allow_pickle=True).item()
        self.objects_id_types_per_frame = np.load(
            d / "objects_id_types_per_frame.npy", allow_pickle=True)
        self.objects_id_2_corners = np.load(
            d / "objects_id_2_corners.npy", allow_pickle=True).item()
        self.objects_id_2_anchors = np.load(
            d / "objects_id_2_anchors.npy", allow_pickle=True).item()
        self.objects_id_2_frameidx = np.load(
            d / "objects_id_2_frameidx.npy", allow_pickle=True).item()
        self.objects_id_2_dynamic_flag = np.load(
            d / "objects_id_2_dynamic_flag.npy", allow_pickle=True).item()
        self.object_ids_per_frame = np.load(
            d / "object_ids_per_frame.npy", allow_pickle=True)

        self.beam_inclinations = self._load_beams(d, calib_row)

        with open(d / "meta_info.json") as f:
            frames = json.load(f)["frames"]
        self.l2w = [np.array(frames[i + frame_offset]["lidar2world"])
                    for i in range(scene_size)]

        self._map_types()
        self._index_dynamic_objects()

    @staticmethod
    def _load_beams(d: Path, calib_row: int) -> np.ndarray:
        pq = d / "training_lidar_calibration.parquet"
        if pq.exists():
            import pandas as pd

            df = pd.read_parquet(
                pq, engine="pyarrow",
                columns=["[LiDARCalibrationComponent].beam_inclination.values"],
            )
            return np.asarray(df.iloc[calib_row, 0], np.float64)
        # fallback for bundles that ship beams as npy/json
        alt = d / "beam_inclinations.npy"
        if alt.exists():
            return np.load(alt)
        raise FileNotFoundError(f"no beam calibration found in {d}")

    # --- object bookkeeping (waymoDynamic.py:118-170) ---

    def _map_types(self):
        self.object_id_2_type: Dict = {}
        for f in range(self.scene_size):
            for oid, typ in zip(self.object_ids_per_frame[f],
                                self.objects_id_types_per_frame[f]):
                self.object_id_2_type[oid] = typ

    def _index_dynamic_objects(self):
        self.object_id_2_global_idx: Dict = {}
        cnt = 0
        for f in range(self.scene_size):
            for oid in self.object_ids_per_frame[f]:
                dyn = self.objects_id_2_dynamic_flag.get(oid, False)
                typ = self.object_id_2_type.get(oid, -1)
                if oid not in self.object_id_2_global_idx and dyn \
                        and typ == VEHICLE_TYPE:
                    self.object_id_2_global_idx[oid] = cnt
                    cnt += 1
        self.dynamic_object_counter = cnt

    def dynamic_object_ids(self) -> List:
        return list(self.object_id_2_global_idx.keys())

    def object_frames(self, object_id) -> List[int]:
        return list(self.objects_id_2_frameidx[object_id])

    def object_aabb(self, object_id) -> np.ndarray:
        """[6] (min_xyz, max_xyz) of the object's anchor box."""
        a = np.asarray(self.objects_id_2_anchors[object_id])
        return np.concatenate([a.min(0), a.max(0)])

    # --- masks (waymoDynamic.py:245-292) ---

    def _object_hit_map(self, frame_idx) -> np.ndarray:
        ids = np.array(self.object_ids_per_frame[frame_idx], dtype=object)
        return ids[self.ray_object_indices[frame_idx]]

    def masks_for_object(self, frame_idx: int, object_id):
        """(static_mask, object_only_mask) for one frame."""
        hit = self._object_hit_map(frame_idx)
        dyn = hit == object_id
        base = self.first_masks[frame_idx] & self.valid_normal_flag[frame_idx]
        obj_only = base & dyn
        return base & ~obj_only, obj_only

    def static_mask(self, frame_idx: int) -> np.ndarray:
        """All dynamic vehicles cut out."""
        hit = self._object_hit_map(frame_idx)
        dyn = np.zeros(hit.shape, bool)
        for oid in self.object_id_2_global_idx:
            dyn |= hit == oid
        base = self.first_masks[frame_idx] & self.valid_normal_flag[frame_idx]
        return base & ~(base & dyn)

    # --- canonical object pose (waymoDynamic.py:225-244, fixed: indexed by
    # occurrence order, as get_obj2world's caller intends) ---

    def object_to_world(self, occurrence_idx: int, object_id) -> np.ndarray:
        corners = np.asarray(self.objects_id_2_corners[object_id][occurrence_idx],
                             np.float64)
        x = np.linalg.norm(corners[0] - corners[4])
        y = np.linalg.norm(corners[0] - corners[3])
        z = np.linalg.norm(corners[0] - corners[1])
        anchor = np.array([
            [0, 0, 0], [0, 0, z], [0, y, z], [0, y, 0],
            [x, 0, 0], [x, 0, z], [x, y, z], [x, y, 0],
        ]) + corners.mean(0)
        R, _t = kabsch(anchor, corners)
        o2w = np.eye(4)
        o2w[:3, :3] = R
        o2w[:3, 3] = corners[0]
        return o2w

    # --- range view / point extraction (waymoDynamic.py:293-360) ---

    def range_view_gt(self, frame_idx: int) -> np.ndarray:
        """[3, H, W]: raydrop(=dist>0), clipped intensity, dist."""
        dist = self.first_dist[frame_idx]
        inten = np.clip(self.first_intensity[frame_idx], 0, 1)
        return np.stack([(dist > 0).astype(np.float32), inten, dist], 0)

    def _masked_points(self, frame_idx: int, mask: np.ndarray) -> np.ndarray:
        """Back-project masked pixels of the frame to sensor-frame xyz."""
        dist = np.where(mask, self.first_dist[frame_idx], 0.0)
        return pano_to_points(dist, None, self.beam_inclinations)[:, :3]

    def static_points_world(self, frame_idx: int) -> np.ndarray:
        pts = self._masked_points(frame_idx, self.static_mask(frame_idx))
        l2w = self.l2w[frame_idx]
        return pts @ l2w[:3, :3].T + l2w[:3, 3]

    def object_points_canonical(self, frame_idx: int, occurrence_idx: int,
                                object_id) -> np.ndarray:
        _, obj_mask = self.masks_for_object(frame_idx, object_id)
        pts = self._masked_points(frame_idx, obj_mask)
        w2l = np.linalg.inv(self.l2w[frame_idx])
        o2l = w2l @ self.object_to_world(occurrence_idx, object_id)
        l2o = np.linalg.inv(o2l)
        return pts @ l2o[:3, :3].T + l2o[:3, 3]


class DynamicModelData(NamedTuple):
    """One trainable sub-scene (background or a single dynamic vehicle)."""

    model_id: object
    train_frames: List[LidarFrame]
    test_frames: List[LidarFrame]
    init_points: np.ndarray
    beams: np.ndarray


# test splits match the static reader (dataset_readers.py:480-486)
DYNAMIC_TEST_POS = (10, 20, 31, 41)


def read_dynamic_model(scene: WaymoDynamicScene, model_id,
                       init_samples: int = 500_000,
                       min_frames: int = 5,
                       min_points: int = 100,
                       seed: int = 0) -> Optional[DynamicModelData]:
    """Build the per-model sub-scene (readDynamicWaymoInfo semantics,
    dataset_readers_dynmaic.py:111-223, with the release bugs fixed).
    model_id == STATIC -> background; otherwise a dynamic vehicle id.
    Returns None when the object has too few frames/points."""
    beams = scene.beam_inclinations
    if model_id == STATIC:
        occurred = list(range(scene.scene_size))
        samples = init_samples
    else:
        occurred = scene.object_frames(model_id)
        samples = min(init_samples, 10_000)
    if len(occurred) < min_frames:
        return None

    frames: List[LidarFrame] = []
    clouds = []
    for occ_i, f in enumerate(occurred):
        l2w = scene.l2w[f]
        gt = scene.range_view_gt(f)
        if model_id == STATIC:
            mask = scene.static_mask(f)
            pose = l2w                               # sensor pose in world
            clouds.append(scene.static_points_world(f))
        else:
            o2w = scene.object_to_world(occ_i, model_id)
            # the sensor pose in the object's canonical frame: the object
            # replaces "world" for this sub-scene
            pose = np.linalg.inv(o2w) @ l2w
            _, mask = scene.masks_for_object(f, model_id)
            clouds.append(scene.object_points_canonical(f, occ_i, model_id))
        frames.append(
            LidarFrame.from_lidar2world(pose, beams, gt, uid=f, pixel_mask=mask)
        )

    cloud = np.concatenate(clouds, 0)
    if cloud.shape[0] < min_points:
        return None
    rng = np.random.default_rng(seed)
    sel = rng.choice(cloud.shape[0], samples, replace=True)
    cloud = cloud[sel]

    train, test = [], []
    for i, fr in enumerate(frames):
        (test if i in DYNAMIC_TEST_POS else train).append(fr)
    return DynamicModelData(model_id, train, test, cloud, np.asarray(beams))


def read_dynamic_scene(context_dir: str, **kw):
    """All sub-scenes of a context: background + every dynamic vehicle."""
    scene = WaymoDynamicScene(context_dir)
    models = []
    bg = read_dynamic_model(scene, STATIC, **kw)
    if bg is not None:
        models.append(bg)
    for oid in scene.dynamic_object_ids():
        m = read_dynamic_model(scene, oid, **kw)
        if m is not None:
            models.append(m)
    return scene, models
