"""LidarFrame: the per-frame "camera" of the range-view renderer.

Replaces the reference's torch `Camera` module (`scene/cameras.py:17-61`)
with an immutable pytree of arrays. The renderer needs only:
  * world->sensor rigid transform (the reference's world_view_transform),
  * sensor origin in world coordinates (lidar_center / camera_center),
  * the ascending beam-inclination table,
  * the 3-channel GT range image [raydrop, intensity, depth].
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class LidarFrame:
    """Immutable per-frame data. All fields are arrays so a stack of frames
    can itself be a LidarFrame (leading batch dim) for data-parallel steps."""

    def __init__(self, w2s_rot, w2s_trans, center, beams, gt_image, uid,
                 pixel_mask=None):
        self.w2s_rot = w2s_rot        # [3,3] world->sensor rotation
        self.w2s_trans = w2s_trans    # [3]   world->sensor translation
        self.center = center          # [3]   sensor origin in world
        self.beams = beams            # [H]   ascending inclinations (rad)
        self.gt_image = gt_image      # [3,H,W] raydrop, intensity, depth
        self.uid = uid                # []    frame index (appearance embedding)
        # optional [H,W] bool loss mask (dynamic decomposition: static- or
        # object-only pixels, scene/waymoDynamic.py:245-275); None = all
        self.pixel_mask = pixel_mask

    @property
    def H(self) -> int:
        return self.gt_image.shape[-2]

    @property
    def W(self) -> int:
        return self.gt_image.shape[-1]

    def tree_flatten(self):
        return (
            (self.w2s_rot, self.w2s_trans, self.center, self.beams,
             self.gt_image, self.uid, self.pixel_mask),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_lidar2world(cls, l2w: np.ndarray, beams: np.ndarray,
                         gt_image: np.ndarray, uid: int = 0,
                         pixel_mask: np.ndarray = None) -> "LidarFrame":
        """Build from a 4x4 lidar->world pose, as the Waymo reader does
        (`scene/dataset_readers.py:416-422`)."""
        l2w = np.asarray(l2w, dtype=np.float64)
        w2l = np.linalg.inv(l2w)
        center = l2w[:3, 3]
        return cls(
            w2s_rot=jnp.asarray(w2l[:3, :3], dtype=jnp.float32),
            w2s_trans=jnp.asarray(w2l[:3, 3], dtype=jnp.float32),
            center=jnp.asarray(center, dtype=jnp.float32),
            beams=jnp.asarray(beams, dtype=jnp.float32),
            gt_image=jnp.asarray(gt_image, dtype=jnp.float32),
            uid=jnp.asarray(uid, dtype=jnp.int32),
            pixel_mask=(None if pixel_mask is None
                        else jnp.asarray(pixel_mask, dtype=jnp.bool_)),
        )

    def transform_to_sensor(self, points: Any) -> Any:
        """World -> sensor frame (the reference's transformPoint4x3 with the
        world_view_transform, `auxiliary.h:94-102`)."""
        return points @ self.w2s_rot.T + self.w2s_trans


def stack_frames(frames: list[LidarFrame]) -> LidarFrame:
    """Stack frames along a leading batch axis (for vmapped / data-parallel
    training steps — net-new vs. the single-frame reference loop)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)


def index_frame(batch: LidarFrame, i) -> LidarFrame:
    """Select frame i from a stacked batch (jit-compatible dynamic index)."""
    return jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False), batch)
