"""Host-side image/annotation transforms (NumPy + cv2).

Port of the reference pipeline semantics (`libs/transform.py`,
`libs/train_libs.py:212-254`): resize to the internal 640x480 frame with a
K remap, then train-time augmentations (shift/scale/rotate, HSV, noise,
smooth, sharpen, occlusion, grayscale), then normalization.

Design deviation (documented): the internal-frame resize and the random
shift/scale/rotate are composed into ONE affine and ONE resample + ONE pose
refit (the reference warps twice and re-solves PnP twice); outputs are
equivalent up to interpolation.
"""
from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np

from ..utils import geometry as geo

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def internal_frame_matrix(width: int, height: int, target_w: int, target_h: int
                          ) -> np.ndarray:
    """Keep-ratio center-fit 3x3 matrix (reference libs/transform.py Resize /
    libs/poses.py test2 construction)."""
    cx, cy = width / 2.0, height / 2.0
    if (target_w / target_h) > (width / height):
        scale = target_h / height
    else:
        scale = target_w / width
    return np.array([[scale, 0.0, -scale * cx + target_w / 2],
                     [0.0, scale, -scale * cy + target_h / 2],
                     [0.0, 0.0, 1.0]], np.float32)


def remap_poses(src_K, Rs, Ts, kp3d_per_obj, dst_K, M3):
    """Re-fit each pose under dst_K after the 2D affine M3
    (reference libs/utils.py:504-526 via libs/poses.py:44-66)."""
    new_Rs, new_Ts = [], []
    for R, T, pt3d in zip(Rs, Ts, kp3d_per_obj):
        # project with src_K, warp, re-solve under dst_K
        MK = M3 @ src_K if M3.shape == (3, 3) else np.vstack([M3, [0, 0, 1]]) @ src_K
        pts = MK @ (np.asarray(R) @ pt3d.T + np.asarray(T).reshape(3, 1))
        xy2d = (pts[:2] / (pts[2:] + 1e-8)).T
        try:
            import cv2
            ok, rvec, tvec = cv2.solvePnP(
                pt3d.reshape(-1, 1, 3).astype(np.float64),
                xy2d.reshape(-1, 1, 2).astype(np.float64),
                dst_K.astype(np.float64), None, flags=cv2.SOLVEPNP_EPNP)
            if ok:
                new_Rs.append(cv2.Rodrigues(rvec)[0].astype(np.float32))
                new_Ts.append(tvec.reshape(3).astype(np.float32))
                continue
        except ImportError:
            pass
        new_Rs.append(np.asarray(R, np.float32))
        new_Ts.append(np.asarray(T, np.float32).reshape(3))
    return new_Rs, new_Ts


def random_ssr_matrix(rng: np.random.Generator, shift: float, scale: float,
                      rot: float, width: int, height: int) -> np.ndarray:
    """Random shift/scale/rotate 3x3 (reference libs/utils.py:161-179)."""
    dw, dh = int(width * shift), int(height * shift)
    px = rng.integers(-dw, dw + 1) if dw > 0 else 0
    py = rng.integers(-dh, dh + 1) if dh > 0 else 0
    ang = rng.uniform(-rot, rot) if rot > 0 else 0.0
    sf = rng.uniform(-scale, scale) + 1.0 if scale > 0 else 1.0
    return geo.shift_scale_rotate_matrix(px, py, ang, sf, width, height)


def distort_hsv(img: np.ndarray, rng, h_ratio, s_ratio, v_ratio) -> np.ndarray:
    import cv2
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    h = hsv[:, :, 0].astype(np.float32)
    s = hsv[:, :, 1].astype(np.float32)
    v = hsv[:, :, 2].astype(np.float32)
    a = rng.uniform(-1, 1) * h_ratio + 1
    b = rng.uniform(-1, 1) * s_ratio + 1
    c = rng.uniform(-1, 1) * v_ratio + 1
    hsv[:, :, 0] = (h * a) if a < 1 else np.clip(h * a, None, 179)
    hsv[:, :, 1] = (s * b) if b < 1 else np.clip(s * b, None, 255)
    hsv[:, :, 2] = (v * c) if c < 1 else np.clip(v * c, None, 255)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def distort_noise(img: np.ndarray, rng, ratio: float) -> np.ndarray:
    sigma = rng.uniform(0, ratio)
    out = img.astype(np.float32) + rng.normal(0, sigma, img.shape) * 255
    return np.clip(out, 0, 255).astype(np.uint8)


def distort_smooth(img: np.ndarray, rng, ratio: float) -> np.ndarray:
    import cv2
    return cv2.GaussianBlur(img, (7, 7), rng.uniform(0, ratio))


def random_occlusion(img: np.ndarray, mask: np.ndarray, rng,
                     prob: float) -> Tuple[np.ndarray, np.ndarray]:
    """Random-erasing inside the object bbox; erased pixels get mask -1
    (reference libs/transform.py RandomOcclusion)."""
    if rng.random() > prob:
        return img, mask
    ys, xs = np.nonzero(mask > 0)
    if len(xs) < 4:
        return img, mask
    x1, x2, y1, y2 = xs.min(), xs.max(), ys.min(), ys.max()
    bw, bh = x2 - x1 + 1, y2 - y1 + 1
    w = max(int(bw * rng.uniform(0.1, 0.4)), 1)
    h = max(int(bh * rng.uniform(0.1, 0.4)), 1)
    ox = int(x1 + rng.uniform(0, 1) * (bw - w))
    oy = int(y1 + rng.uniform(0, 1) * (bh - h))
    img = img.copy()
    mask = mask.copy()
    img[oy:oy + h, ox:ox + w] = rng.integers(0, 256, (h, w, img.shape[2]))
    mask[oy:oy + h, ox:ox + w] = -1
    return img, mask


def pencil_sharpen(img: np.ndarray, rng, prob: float) -> np.ndarray:
    """Edge-boost aug (reference libs/transform.py RandomPencilSharpen):
    blur, derive an edge image (ratio or difference), min-max normalize,
    alpha-blend back."""
    import cv2
    if rng.random() >= prob:
        return img
    ks = int(rng.choice([5, 7, 9, 11]))
    blurred = cv2.blur(img, (ks, ks)).astype(np.float32)
    if rng.random() < 0.5:
        edge = img / (blurred + 0.01)
    else:
        edge = img - blurred
    edge = cv2.normalize(edge, None, alpha=0, beta=255,
                         norm_type=cv2.NORM_MINMAX).astype(np.uint8)
    alpha = rng.uniform(0.5, 0.95)
    out = img * (1 - alpha) + edge * alpha
    return cv2.normalize(out, None, alpha=0, beta=255,
                         norm_type=cv2.NORM_MINMAX).astype(np.uint8)


class BackgroundBank:
    """Random background replacement (reference libs/transform.py
    RandomBackground): with p=0.5 the pixels outside the instance mask are
    swapped for a random image from a directory."""

    def __init__(self, background_dir: Optional[str]):
        self.files = []
        if background_dir and os.path.isdir(background_dir):
            self.files = [os.path.join(background_dir, f)
                          for f in sorted(os.listdir(background_dir))
                          if f.endswith((".png", ".jpg"))]

    def __call__(self, img: np.ndarray, mask: np.ndarray, rng) -> np.ndarray:
        if not self.files or rng.random() < 0.5:
            return img
        import cv2
        bg = None
        for _ in range(4):
            bg = cv2.imread(self.files[int(rng.integers(0, len(self.files)))])
            if bg is not None:
                break
        if bg is None:
            return img
        bg = cv2.resize(bg, (img.shape[1], img.shape[0]))
        out = img.copy()
        keep = mask > 0
        out[~keep] = bg[~keep]
        return out


def grayscalize(img: np.ndarray) -> np.ndarray:
    import cv2
    g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return np.stack([g] * 3, -1)


def normalize(img_bgr: np.ndarray) -> np.ndarray:
    """BGR uint8 -> normalized RGB float32 (reference libs/transform.py
    Normalize: /255, ImageNet mean/std)."""
    rgb = img_bgr[:, :, ::-1].astype(np.float32) / 255.0
    return (rgb - IMAGENET_MEAN) / IMAGENET_STD


# ---- warp dispatchers: native C++ data-plane when available, else cv2 ----

def warp_image(img: np.ndarray, M: np.ndarray, out_wh, border=(0, 0, 0)) -> np.ndarray:
    from . import native
    out = native.warp_affine_u8(img, np.asarray(M, np.float64), (out_wh[1], out_wh[0]),
                                border=border)
    if out is not None:
        return out
    import cv2
    return cv2.warpAffine(img, np.asarray(M, np.float64)[:2], tuple(out_wh),
                          flags=cv2.INTER_LINEAR, borderValue=tuple(border))


def warp_mask(mask: np.ndarray, M: np.ndarray, out_wh, border: int = 0) -> np.ndarray:
    from . import native
    out = native.warp_affine_i32(np.ascontiguousarray(mask, np.int32),
                                 np.asarray(M, np.float64),
                                 (out_wh[1], out_wh[0]), border=border)
    if out is not None:
        return out
    import cv2
    return cv2.warpAffine(mask.astype(np.float32), np.asarray(M, np.float64)[:2],
                          tuple(out_wh), flags=cv2.INTER_NEAREST,
                          borderValue=border).astype(np.int32)


def normalize_fast(img_bgr: np.ndarray) -> np.ndarray:
    from . import native
    out = native.normalize_bgr_u8(img_bgr, IMAGENET_MEAN, IMAGENET_STD)
    return out if out is not None else normalize(img_bgr)
