"""Visualization: KD point-cloud scatters and pose overlays.

Equivalents of the reference's `tools/visualizer.py` (student-vs-teacher OT
cloud scatter plots, point size ~ weight, saved every N steps) and the
drawing helpers in `libs/utils.py` (3D bounding box / pose axes overlays).
All host-side and optional (matplotlib / cv2 guarded)."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def vis_kd_clouds(student_xy: np.ndarray, teacher_xy: np.ndarray,
                  student_w: Optional[np.ndarray], teacher_w: Optional[np.ndarray],
                  step: int, save_dir: str, loss: Optional[float] = None) -> Optional[str]:
    """Scatter of student (green) vs teacher (red) keypoint clouds for one
    image; point size proportional to OT weight (reference
    tools/visualizer.py:5-100). Returns the saved path."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    os.makedirs(save_dir, exist_ok=True)
    s = np.asarray(student_xy).reshape(-1, 2)
    t = np.asarray(teacher_xy).reshape(-1, 2)
    sw = (np.asarray(student_w).reshape(-1) if student_w is not None
          else np.ones(len(s)))
    tw = (np.asarray(teacher_w).reshape(-1) if teacher_w is not None
          else np.ones(len(t)))
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.scatter(s[:, 0], s[:, 1], s=10 + 200 * sw / (sw.max() + 1e-9),
               c="green", alpha=0.5, label="student")
    ax.scatter(t[:, 0], t[:, 1], s=10 + 200 * tw / (tw.max() + 1e-9),
               c="red", alpha=0.5, label="teacher")
    ax.invert_yaxis()
    ax.legend()
    title = f"step {step}"
    if loss is not None:
        title += f"  kd_loss={loss:.4f}"
    ax.set_title(title)
    path = os.path.join(save_dir, f"{step}_img_2d.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def vis_accuracy_per_depth(results: dict, save_path: str) -> Optional[str]:
    """2D/3D success-rate vs depth-bin curves (reference
    libs/utils.py:565-618 visualize_accuracy_per_depth)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    adi = results.get("adi_per_depth", [])
    rep = results.get("rep_per_depth", [])
    lo, hi = results.get("depth_range", [0, 1])
    bins = max(len(adi), 1)
    xs = np.arange(lo, hi, (hi - lo) / bins)[:bins]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 4))
    keys_rep = sorted({k for d in rep for k in d})
    keys_adi = sorted({k for d in adi for k in d})
    for k in keys_rep:
        ax1.plot(xs, [d.get(k, 0.0) for d in rep], marker="o", label=k)
    for k in keys_adi:
        ax2.plot(xs, [d.get(k, 0.0) for d in adi], marker="o", label=k)
    ax1.set_title("2D error vs depth")
    ax2.set_title("3D error vs depth")
    for ax in (ax1, ax2):
        ax.set_xlabel("depth (mm)")
        ax.grid(True)
        ax.legend(fontsize=7)
    ax1.set_ylabel("success rate (%)")
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return save_path


def draw_bounding_box(img: np.ndarray, R, T, corners3d, K,
                      color=(0, 255, 0), bbox_trans=None) -> np.ndarray:
    """Draw the projected 3D bbox wireframe (reference libs/utils.py drawing
    helpers). Corner ordering: binary over (x, y, z)."""
    import cv2
    from ..utils import geometry as geo
    pts = geo.project_points(np.asarray(K), np.asarray(R), np.asarray(T),
                             np.asarray(corners3d))
    if bbox_trans is not None:
        pts = geo.apply_affine(np.asarray(bbox_trans), pts)
    pts = pts.astype(int)
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    out = img.copy()
    for a, b in edges:
        cv2.line(out, tuple(pts[a]), tuple(pts[b]), color, 2)
    return out


def draw_pose_axes(img: np.ndarray, R, T, K, length: float = 50.0,
                   bbox_trans=None) -> np.ndarray:
    """Draw the object coordinate axes (x red, y green, z blue)."""
    import cv2
    from ..utils import geometry as geo
    pts3d = np.array([[0, 0, 0], [length, 0, 0], [0, length, 0], [0, 0, length]],
                     np.float32)
    pts = geo.project_points(np.asarray(K), np.asarray(R), np.asarray(T), pts3d)
    if bbox_trans is not None:
        pts = geo.apply_affine(np.asarray(bbox_trans), pts)
    pts = pts.astype(int)
    out = img.copy()
    for i, color in ((1, (0, 0, 255)), (2, (0, 255, 0)), (3, (255, 0, 0))):
        cv2.line(out, tuple(pts[0]), tuple(pts[i]), color, 2)
    return out


def draw_2d_keypoints(img: np.ndarray, kp2d, color=(0, 255, 255),
                      radius: int = 2, scores=None) -> np.ndarray:
    """Draw voted/predicted 2D keypoints as filled circles; with `scores`,
    radius scales with confidence (reference libs/utils.py:555-563
    draw_2d_keypoints)."""
    import cv2
    out = img.copy()
    pts = np.asarray(kp2d, np.float64).reshape(-1, 2)
    sc = (np.asarray(scores, np.float64).reshape(-1) if scores is not None
          else np.ones(len(pts)))
    smax = sc.max() + 1e-9
    h, w = out.shape[:2]
    for (x, y), s in zip(pts, sc):
        if not (np.isfinite(x) and np.isfinite(y)):
            continue
        if -w < x < 2 * w and -h < y < 2 * h:
            r = max(1, int(round(radius * (0.5 + s / smax))))
            cv2.circle(out, (int(round(x)), int(round(y))), r, color, -1)
    return out


def draw_mesh_contour(img: np.ndarray, R, T, K, vertices,
                      color=(255, 0, 255), thickness: int = 2,
                      max_vertices: int = 1000) -> np.ndarray:
    """Draw the object silhouette as the convex hull of the projected mesh
    vertices. Renderer-free equivalent of the reference's pyrender-based
    contour overlay (libs/utils.py:655-713): for LINEMOD-scale convex-ish
    objects the hull closely tracks the true silhouette, and it needs no
    offscreen GL context (pyrender is unavailable in this image)."""
    import cv2
    from ..utils import geometry as geo
    v = np.asarray(vertices, np.float64)
    if len(v) > max_vertices:  # same subsample cap as the ADD/ADI metric path
        v = v[np.linspace(0, len(v) - 1, max_vertices).astype(int)]
    pts = geo.project_points(np.asarray(K), np.asarray(R), np.asarray(T), v)
    pts = pts[np.isfinite(pts).all(-1)]
    out = img.copy()
    if len(pts) < 3:
        return out
    hull = cv2.convexHull(pts.astype(np.float32))
    cv2.polylines(out, [hull.astype(np.int32)], True, color, thickness)
    return out
