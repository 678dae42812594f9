"""Fixed-shape device batch structures.

The reference moves a Python list of `PoseAnnot` objects to the GPU each step
(`train_kd.py:104-105`). TPU-native design: one pytree of fixed-shape arrays;
variable object counts become a -1-padded (B, G) class table; everything else
(masks, poses, crop affines) is dense.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class Batch(NamedTuple):
    """One training/eval step of data. All shapes static.

    images:       (B, R, R, 3) float32, normalized RGB (DZI crops)
    mask:         (B, R, R)    int32 instance ids: 0 bg, 1..G objects, -1 erased
    class_ids:    (B, G)       int32 0-based class ids, -1 padding
    rotations:    (B, G, 3, 3) float32
    translations: (B, G, 3)    float32 (mm)
    bbox_trans:   (B, 2, 3)    float32 affine internal-frame -> crop
    """
    images: jnp.ndarray
    mask: jnp.ndarray
    class_ids: jnp.ndarray
    rotations: jnp.ndarray
    translations: jnp.ndarray
    bbox_trans: jnp.ndarray


class TaskConsts(NamedTuple):
    """Per-dataset constants closed over by the compiled step.

    K:          (3, 3)        internal camera intrinsics
    inv_K:      (3, 3)
    kp3d:       (n_fg, 8, 3)  3D bbox corners per class (mm)
    diameters:  (n_fg,)       mesh diameters (mm)
    verts:      (n_fg, V, 3)  surface sample points per class (mm), or None
                — only populated for the dense binary-code head
    vert_codes: (n_fg, V, n_bits) hierarchical binary codes of `verts`
                (ops/binary_code.build_codes), or None
    """
    K: jnp.ndarray
    inv_K: jnp.ndarray
    kp3d: jnp.ndarray
    diameters: jnp.ndarray
    verts: Optional[jnp.ndarray] = None
    vert_codes: Optional[jnp.ndarray] = None

    @staticmethod
    def create(K: np.ndarray, kp3d: np.ndarray, diameters,
               verts: Optional[np.ndarray] = None,
               vert_codes: Optional[np.ndarray] = None) -> "TaskConsts":
        K = np.asarray(K, np.float32).reshape(3, 3)
        return TaskConsts(
            K=jnp.asarray(K),
            inv_K=jnp.asarray(np.linalg.inv(K).astype(np.float32)),
            kp3d=jnp.asarray(np.asarray(kp3d, np.float32)),
            diameters=jnp.asarray(np.asarray(diameters, np.float32)),
            verts=(None if verts is None
                   else jnp.asarray(np.asarray(verts, np.float32))),
            vert_codes=(None if vert_codes is None
                        else jnp.asarray(np.asarray(vert_codes, np.float32))),
        )
