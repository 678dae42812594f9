"""Device-side affine image warping (the host pipeline's crop, in-graph).

Why: the serving artifact (engine/serving.py) otherwise requires the caller
to run the host crop chain (cv2 / native/dataplane.cpp) before inference.
With the warp expressed in XLA, a "frame"-mode endpoint takes RAW frames +
a (center, scale) detection window and performs the internal-frame fit +
DZI crop inside the compiled program — zero host image ops at inference,
and the whole path ships inside one StableHLO artifact.

Semantics match the host chain (reference libs/dataset.py getitem_dzi two-
warp composition, re-derived like data/pipeline.py's fast path): ONE
composed raw->crop affine, constant gray(128) outside the raw image,
black(0) outside the internal frame. Bilinear taps blend the border
constant exactly like cv2.warpAffine(BORDER_CONSTANT).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dzi_affine_rows(center: jnp.ndarray, scale: jnp.ndarray, res: int
                    ) -> jnp.ndarray:
    """Batched (B,2,3) DZI crop affine (utils/geometry.dzi_affine, rot=0):
    maps the square window (center, scale) in source coords to res²."""
    r = res / scale                                      # (B,)
    zeros = jnp.zeros_like(r)
    tx = res / 2.0 - r * center[:, 0]
    ty = res / 2.0 - r * center[:, 1]
    row0 = jnp.stack([r, zeros, tx], axis=-1)
    row1 = jnp.stack([zeros, r, ty], axis=-1)
    return jnp.stack([row0, row1], axis=1).astype(jnp.float32)


def compose_affine(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(2,3) affine composition A∘B (apply B first). Accepts batched (...,2,3)."""
    RA, tA = A[..., :2], A[..., 2]
    RB, tB = B[..., :2], B[..., 2]
    R = jnp.einsum("...ij,...jk->...ik", RA, RB)
    t = jnp.einsum("...ij,...j->...i", RA, tB) + tA
    return jnp.concatenate([R, t[..., None]], axis=-1)


def invert_affine(M: jnp.ndarray) -> jnp.ndarray:
    """(...,2,3) -> (...,2,3) inverse."""
    a, b, tx = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    c, d, ty = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    det = a * d - b * c
    ia, ib, ic, id_ = d / det, -b / det, -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _sample_bilinear(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                     border: float) -> jnp.ndarray:
    """img (H,W,C) float; sx/sy (res,res) source coords. Out-of-range taps
    contribute the border constant, blended bilinearly (cv2 BORDER_CONSTANT)."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[..., None], v, border)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def affine_crop(img: jnp.ndarray, M: jnp.ndarray, res: int,
                border: float = 0.0) -> jnp.ndarray:
    """Warp ONE image (H,W,C) by the (2,3) affine M (source->output coords,
    the transforms.warp_image convention) onto a res² grid."""
    Minv = invert_affine(M)
    xs = jnp.arange(res, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")          # (res,res)
    sx = Minv[0, 0] * gx + Minv[0, 1] * gy + Minv[0, 2]
    sy = Minv[1, 0] * gx + Minv[1, 1] * gy + Minv[1, 2]
    out = _sample_bilinear(img.astype(jnp.float32), sx, sy, border)
    return out


def frame_to_crop(frames: jnp.ndarray, M_int: jnp.ndarray,
                  center: jnp.ndarray, scale: jnp.ndarray, res: int,
                  internal_wh: Tuple[int, int] = (640, 480)
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched raw frame -> DZI crop, entirely on device.

    frames (B,H,W,3) uint8 BGR; M_int (2,3) static raw->internal fit
    (transforms.internal_frame_matrix of the frame size); center (B,2) and
    scale (B,) define the DZI window in INTERNAL-frame coords. Returns
    (crops (B,res,res,3) uint8, bbox_trans (B,2,3)) — bbox_trans is the
    internal->crop affine the postprocess needs.

    Matches the host chain's border semantics: gray(128) where the window
    sees past the raw image, black(0) past the 640x480 internal frame
    (data/pipeline.py fast path; tests pin <=1 LSB vs the host warp).
    """
    W, H = internal_wh
    Mc = dzi_affine_rows(center, scale, res)               # (B,2,3)
    Mfull = compose_affine(Mc, jnp.asarray(M_int, jnp.float32))

    def one(img, mc_full, mc):
        crop = affine_crop(img, mc_full, res, border=128.0)
        # blackout outside the internal frame (second warp's border)
        Minv = invert_affine(mc)
        xs = jnp.arange(res, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
        ix = Minv[0, 0] * gx + Minv[0, 1] * gy + Minv[0, 2]
        iy = Minv[1, 0] * gx + Minv[1, 1] * gy + Minv[1, 2]
        inside = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        crop = jnp.where(inside[..., None], crop, 0.0)
        return jnp.clip(jnp.round(crop), 0, 255).astype(jnp.uint8)

    crops = jax.vmap(one)(frames, Mfull, Mc)
    return crops, Mc
