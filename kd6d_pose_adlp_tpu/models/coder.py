"""Keypoint target coder (POINT regression).

Vectorized re-design of the reference `TargetCoder` (`models/model.py:106-166`):
per anchor cell, the 16-D regression target is the 8 projected 3D bbox-corner
positions, normalized by the anchor center/size, laid out as
[dx_0..dx_7, dy_0..dy_7].

All functions are jit/vmap-friendly, operate on (..., ) leading batch dims,
and use the (cx, cy, w, h) anchor table from `anchors.make_anchors`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Tiny 3x3 / 2x2 geometric matmuls must not be demoted to bf16 on the MXU —
# pose accuracy is sub-pixel. Forces f32 accumulation at negligible cost.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def project_corners(K, R, T, corners3d, bbox_trans=None):
    """Project 8 corners through the pose and (optionally) a 2x3 crop affine.

    K (3,3); R (...,3,3); T (...,3) or (...,3,1); corners3d (...,8,3);
    bbox_trans (...,2,3) or None. Returns (...,8,2) pixel coords.
    """
    T = T.reshape(T.shape[: R.ndim - 2] + (3, 1))
    cam = _einsum("...ij,...kj->...ik", R, corners3d) + T      # (...,3,8)
    uv = _einsum("ij,...jk->...ik", K, cam)                     # (...,3,8)
    xy = uv[..., :2, :] / (uv[..., 2:3, :] + 1e-8)                 # (...,2,8)
    if bbox_trans is not None:
        A = bbox_trans[..., :2, :2]
        t = bbox_trans[..., :2, 2:3]
        xy = _einsum("...ij,...jk->...ik", A, xy) + t
    return jnp.swapaxes(xy, -1, -2)                                # (...,8,2)


def encode(kp2d, anchors):
    """kp2d (...,8,2) crop-frame corner pixels; anchors (...,4) [cx,cy,w,h]
    -> (...,16) = [dx(8), dy(8)] (reference models/model.py:113-137)."""
    cx, cy = anchors[..., 0:1], anchors[..., 1:2]
    w, h = anchors[..., 2:3], anchors[..., 3:4]
    dx = (kp2d[..., 0] - cx) / w
    dy = (kp2d[..., 1] - cy) / h
    return jnp.concatenate([dx, dy], axis=-1)


def decode(pred, anchors, bbox_trans_inv=None):
    """pred (...,16) -> (...,8,2) pixels. If `bbox_trans_inv` (...,2,3) is
    given, maps crop-frame pixels back to the internal 640x480 frame
    (reference models/model.py:144-166 applies inv(bbox_trans))."""
    cx, cy = anchors[..., 0:1], anchors[..., 1:2]
    w, h = anchors[..., 2:3], anchors[..., 3:4]
    px = pred[..., :8] * w + cx
    py = pred[..., 8:] * h + cy
    xy = jnp.stack([px, py], axis=-1)                               # (...,8,2)
    if bbox_trans_inv is not None:
        A = bbox_trans_inv[..., :2, :2]
        t = bbox_trans_inv[..., :2, 2]
        xy = _einsum("...ij,...kj->...ki", A, xy) + t[..., None, :]
    return xy


def invert_bbox_trans(bbox_trans):
    """(...,2,3) -> (...,2,3) inverse affine (jit-friendly closed form)."""
    a, b, c = bbox_trans[..., 0, 0], bbox_trans[..., 0, 1], bbox_trans[..., 0, 2]
    d, e, f = bbox_trans[..., 1, 0], bbox_trans[..., 1, 1], bbox_trans[..., 1, 2]
    det = a * e - b * d
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    row0 = jnp.stack([ia, ib, ic], axis=-1)
    row1 = jnp.stack([id_, ie, if_], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
