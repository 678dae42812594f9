"""Write a real on-disk BOP-layout dataset from the procedural renderer.

Dress rehearsal for LINEMOD (VERDICT r2 next-round #4): materializes
rgb/, mask_visib/, scene_gt.json, scene_camera.json, models/*.ply,
bbox.json, train/test lists and a reference-schema YAML — the exact tree
`train_kd.py --data bop` consumes through the full host pipeline
(BOPPoseDataset -> PrefetchLoader -> DZI) instead of the in-memory
synthetic path. Layout mirrors reference libs/dataset.py:27-183.

Run: python scripts/make_bop_dataset.py --out outputs/bop_synth \
         --n_train 1024 --n_test 256
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def write_ply(path: str, verts: np.ndarray):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")


def write_split(ds, root: str, split: str, indices, index_base: int):
    """One BOP scene dir per split; returns the image list entries."""
    import cv2
    scene = os.path.join(root, split, "000001")
    os.makedirs(os.path.join(scene, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(scene, "mask_visib"), exist_ok=True)
    cam, gt, names = {}, {}, []
    for j, idx in enumerate(indices):
        s = ds.sample_internal(index_base + idx)
        name = f"{j:06d}"
        cv2.imwrite(os.path.join(scene, "rgb", f"{name}.png"),
                    s["img"][:, :, ::-1])  # RGB -> BGR for cv2
        cv2.imwrite(os.path.join(scene, "mask_visib", f"{name}_000000.png"),
                    s["mask"])
        cam[str(j)] = {"cam_K": ds.K.reshape(-1).tolist(), "depth_scale": 1.0}
        gt[str(j)] = [{"cam_R_m2c": np.asarray(s["R"]).reshape(-1).tolist(),
                       "cam_t_m2c": np.asarray(s["T"]).reshape(-1).tolist(),
                       "obj_id": int(s["cls"]) + 1}]
        names.append(f"{split}/000001/rgb/{name}.png")
    with open(os.path.join(scene, "scene_camera.json"), "w") as f:
        json.dump(cam, f)
    with open(os.path.join(scene, "scene_gt.json"), "w") as f:
        json.dump(gt, f)
    return names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="outputs/bop_synth")
    ap.add_argument("--n_train", type=int, default=1024)
    ap.add_argument("--n_test", type=int, default=256)
    ap.add_argument("--n_fg", type=int, default=15)
    ap.add_argument("--single_class", type=int, default=0,
                    help="-1 = multi-class scenes")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.utils.mesh import mesh_bbox_corners

    ds = SyntheticPoseDataset(
        n_fg=args.n_fg,
        single_class=None if args.single_class < 0 else args.single_class,
        seed=args.seed)
    root = args.out
    os.makedirs(os.path.join(root, "models"), exist_ok=True)

    # meshes: the procedural cuboid corner sets (the BOP pipeline derives
    # kp3d via mesh_bbox_corners, which is identity for these)
    bboxes = []
    for c in range(args.n_fg):
        write_ply(os.path.join(root, "models", f"obj_{c + 1:06d}.ply"),
                  ds.kp3d[c])
        bboxes.append(mesh_bbox_corners(ds.kp3d[c]).tolist())
    with open(os.path.join(root, "bbox.json"), "w") as f:
        json.dump(bboxes, f)

    t0 = time.time()
    train_names = write_split(ds, root, "train", range(args.n_train),
                              index_base=1000)
    test_names = write_split(ds, root, "test", range(args.n_test),
                             index_base=0)
    with open(os.path.join(root, "train_list.txt"), "w") as f:
        f.write("\n".join(train_names))
    with open(os.path.join(root, "test_list.txt"), "w") as f:
        f.write("\n".join(test_names))

    yaml_path = os.path.join(root, "config.yaml")
    diam = [round(float(d), 2) for d in np.asarray(ds.diameters)]
    with open(yaml_path, "w") as f:
        f.write(
            "DATASETS:\n"
            f"  TRAIN: '{root}/train_list.txt'\n"
            f"  VALID: '{root}/test_list.txt'\n"
            f"  TEST: '{root}/test_list.txt'\n"
            f"  MESH_DIR: '{root}/models/'\n"
            f"  BBOX_FILE: '{root}/bbox.json'\n"
            f"  N_CLASS: {args.n_fg + 1}\n"
            f"  MESH_DIAMETERS: {diam}\n"
            "INPUT:\n  INTERNAL_WIDTH: 640\n  INTERNAL_HEIGHT: 480\n"
            f"  INTERNAL_K: {np.asarray(ds.K).reshape(-1).tolist()}\n"
            "SOLVER:\n  IMS_PER_BATCH: 16\n"
            "TEST:\n  IMS_PER_BATCH: 8\n")
    n = args.n_train + args.n_test
    print(f"wrote {n} images under {root} in {time.time() - t0:.0f}s "
          f"({n / max(time.time() - t0, 1e-9):.1f} img/s); config: {yaml_path}")


if __name__ == "__main__":
    main()
