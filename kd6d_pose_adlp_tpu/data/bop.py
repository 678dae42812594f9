"""BOP dataset parsing (host side).

Port of the reference's annotation flow (`libs/utils.py:238-301`,
`libs/dataset.py:27-183`): image list -> per-image (K, merged instance mask,
class ids, R, T) from scene_camera.json / scene_gt.json / mask_visib pngs.
JSON files are cached per directory (the reference re-reads them per item
through an optional memory cache)."""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Tuple

import numpy as np


@functools.lru_cache(maxsize=256)
def _load_json(path: str):
    with open(path) as f:
        return json.load(f)


def read_image(path: str) -> np.ndarray:
    """BGR uint8 image with the reference's normalizations
    (libs/dataset.py:59-90): uint16 -> uint8, gray -> 3ch, alpha -> white bg."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.dtype == np.uint16:
        img = (img / 256).astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[2] == 4:
        alpha = img[:, :, 3:4].astype(np.float32) / 255.0
        img = (img[:, :, :3].astype(np.float32) * alpha
               + 255.0 * (1 - alpha)).astype(np.uint8)
    return img


def get_single_bop_annotation(img_path: str, obj2cls: Dict[str, int]
                              ) -> Tuple[np.ndarray, np.ndarray, List[int],
                                         List[np.ndarray], List[np.ndarray]]:
    """(K, merged_mask(int32), class_ids, Rs, Ts) — reference libs/utils.py:238-301."""
    import cv2
    img_path = img_path.strip()
    gt_dir, tmp, img_name = img_path.rsplit("/", 2)
    assert tmp == "rgb", img_path
    base = os.path.splitext(img_name)[0]
    cam_json = _load_json(os.path.join(gt_dir, "scene_camera.json"))
    gt_json = _load_json(os.path.join(gt_dir, "scene_gt.json"))
    im_id = str(int(base)) if str(int(base)) in cam_json else base
    annot_cam = cam_json[im_id]
    annot_poses = gt_json[im_id]

    K = np.asarray(annot_cam["cam_K"], np.float32).reshape(3, 3)
    class_ids, Rs, Ts = [], [], []
    merged = None
    inst = 1
    for i, pose in enumerate(annot_poses):
        mask_file = os.path.join(gt_dir, "mask_visib", f"{base}_{i:06d}.png")
        mv = cv2.imread(mask_file, cv2.IMREAD_UNCHANGED)
        if mv is None:
            continue
        if merged is None:
            merged = np.zeros(mv.shape[:2], np.int32)
        obj_id = str(pose["obj_id"])
        if obj_id not in obj2cls:
            continue
        class_ids.append(obj2cls[obj_id])
        Rs.append(np.asarray(pose["cam_R_m2c"], np.float32).reshape(3, 3))
        Ts.append(np.asarray(pose["cam_t_m2c"], np.float32).reshape(3))
        merged[mv == 255] = inst
        inst += 1
    if merged is None:
        merged = np.zeros((480, 640), np.int32)
    return K, merged, class_ids, Rs, Ts


def read_image_list(list_file: str) -> List[str]:
    root = os.path.dirname(os.path.abspath(list_file))
    with open(list_file) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    return [ln if os.path.isabs(ln) else os.path.join(root, ln) for ln in lines]
