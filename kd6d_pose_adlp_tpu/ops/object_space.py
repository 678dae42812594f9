"""Regression losses: WDR object-space (3D) and image-space (2D).

Reference: `losses/loss.py:112-162`. TPU re-design: instead of gathering the
variable-size positive set, compute the per-cell loss densely over all A cells
and mask-sum with the positive indicator — fixed shapes, no gathers, and the
arithmetic (8 rays x 3x3 projection matrices per cell) is trivially small
next to the conv towers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def select_class_pred(pred_reg: jnp.ndarray, cls_idx: jnp.ndarray) -> jnp.ndarray:
    """pred_reg (B, A, n_fg*16), cls_idx (B, A) -> (B, A, 16): the 16-vector of
    each cell's assigned class (reference losses/loss.py:136)."""
    B, A, C16 = pred_reg.shape
    n_fg = C16 // 16
    pr = pred_reg.reshape(B, A, n_fg, 16)
    idx = jnp.clip(cls_idx, 0, n_fg - 1)[..., None, None]
    return jnp.take_along_axis(pr, idx, axis=2)[..., 0, :]


def object_space_loss(pred_xy: jnp.ndarray,       # (B, A, 8, 2) decoded, internal frame
                      kp3d_cam: jnp.ndarray,      # (B, A, 8, 3) matched GT corners, camera frame
                      cls_idx: jnp.ndarray,       # (B, A) matched class (0-based)
                      pos_mask: jnp.ndarray,      # (B, A) bool
                      inv_K: jnp.ndarray,         # (3, 3) inverse internal K
                      diameters: jnp.ndarray,     # (n_fg,)
                      scaling: float = 50.0) -> jnp.ndarray:
    """WDR object-space loss (reference losses/loss.py:129-162): back-project
    predicted keypoints to rays B = K^-1 [x,y,1]; project the GT camera-frame
    corner onto each ray with P = BB^T/(B^T B); diameter-normalized
    SmoothL1(scale 50 = 0.02d), per-cell mean over 8x3, masked sum over cells."""
    ones = jnp.ones_like(pred_xy[..., :1])
    homo = jnp.concatenate([pred_xy, ones], axis=-1)            # (B,A,8,3)
    rays = _einsum("ij,bakj->baki", inv_K, homo)                # (B,A,8,3)
    denom = (rays * rays).sum(-1, keepdims=True)                # (B,A,8,1)
    # P @ X = B (B.X)/(B.B) — avoid materializing the 3x3 outer product
    bx = (rays * kp3d_cam).sum(-1, keepdims=True)               # (B,A,8,1)
    px = rays * bx / denom                                      # (B,A,8,3)

    d = diameters[jnp.clip(cls_idx, 0, diameters.shape[0] - 1)][..., None, None]
    px_n = px / d
    gt_n = kp3d_cam / d
    per_cell = smooth_l1(scaling * px_n, scaling * gt_n).reshape(
        px.shape[0], px.shape[1], -1).mean(-1) / scaling         # (B,A)
    return (per_cell * pos_mask).sum()


def image_space_loss(pred_xy: jnp.ndarray,        # (B, A, 8, 2) decoded
                     target_xy: jnp.ndarray,      # (B, A, 8, 2) decoded targets
                     pos_mask: jnp.ndarray,       # (B, A)
                     scaling: float = 2.0) -> jnp.ndarray:
    """2D image-space loss (reference losses/loss.py:112-127)."""
    per_cell = smooth_l1(scaling * pred_xy, scaling * target_xy).reshape(
        pred_xy.shape[0], pred_xy.shape[1], -1).mean(-1) / scaling
    return (per_cell * pos_mask).sum()
