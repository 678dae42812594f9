"""BOP on-disk pipeline: fabricate a miniature BOP dataset and run the full
host pipeline (PLY loader -> annotations -> internal-frame warp + pose refit
-> DZI crop -> fixed-shape batch)."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from kd6d_pose_adlp_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
from kd6d_pose_adlp_tpu.data.pipeline import BOPPoseDataset, PrefetchLoader, collate
from kd6d_pose_adlp_tpu.utils import geometry as geo
from kd6d_pose_adlp_tpu.utils.mesh import load_bop_meshes, load_ply_vertices, mesh_bbox_corners

K0 = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float64)
CORNERS = np.array([[x, y, z] for x in (-40, 40) for y in (-30, 30)
                    for z in (-50, 50)], np.float32)


def _write_ply(path, verts):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop")
    models = root / "models"
    models.mkdir()
    _write_ply(models / "obj_000001.ply", CORNERS)
    with open(root / "bbox.json", "w") as f:
        json.dump([mesh_bbox_corners(CORNERS).tolist()], f)

    scene = root / "train" / "000001"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask_visib").mkdir()
    cam, gt = {}, {}
    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        R = geo.quaternion2rotation(rng.normal(size=4))
        T = np.array([rng.uniform(-50, 50), rng.uniform(-40, 40),
                      rng.uniform(700, 1000)])
        kp = geo.project_points(K0, R, T, CORNERS.astype(np.float64))
        img = np.full((480, 640, 3), 70, np.uint8)
        hull = cv2.convexHull(kp.astype(np.float32))
        cv2.fillConvexPoly(img, hull.astype(np.int32), (30, 200, 90))
        mask = np.zeros((480, 640), np.uint8)
        cv2.fillConvexPoly(mask, hull.astype(np.int32), 255)
        name = f"{i:06d}"
        cv2.imwrite(str(scene / "rgb" / f"{name}.png"), img)
        cv2.imwrite(str(scene / "mask_visib" / f"{name}_000000.png"), mask)
        cam[str(i)] = {"cam_K": K0.reshape(-1).tolist(), "depth_scale": 1.0}
        gt[str(i)] = [{"cam_R_m2c": R.reshape(-1).tolist(),
                       "cam_t_m2c": T.reshape(-1).tolist(), "obj_id": 1}]
        names.append(f"train/000001/rgb/{name}.png")
    with open(scene / "scene_camera.json", "w") as f:
        json.dump(cam, f)
    with open(scene / "scene_gt.json", "w") as f:
        json.dump(gt, f)
    with open(root / "train_list.txt", "w") as f:
        f.write("\n".join(names))
    return root


def _cfg(root):
    return Config(
        data=DataConfig(train_list=str(root / "train_list.txt"),
                        mesh_dir=str(root / "models") + "/",
                        bbox_file=str(root / "bbox.json"),
                        n_class=2, mesh_diameters=(float(np.linalg.norm([80, 60, 100])),),
                        symmetry_types=()),
        model=ModelConfig(input_res=128),
        solver=SolverConfig(max_objs=2, ims_per_batch=2),
    )


def test_ply_loader(bop_root):
    verts = load_ply_vertices(str(bop_root / "models" / "obj_000001.ply"))
    np.testing.assert_allclose(verts, CORNERS)
    meshes, obj2cls = load_bop_meshes(str(bop_root / "models") + "/")
    assert obj2cls == {"1": 0}
    assert len(meshes) == 1


@pytest.mark.parametrize("train", [True, False])
def test_bop_sample_contract_and_geometry(bop_root, train):
    cfg = _cfg(bop_root)
    ds = BOPPoseDataset(cfg, cfg.data.train_list, train=train)
    assert len(ds) == 4
    s = ds.sample(0, seed=1)
    assert s is not None
    res = cfg.model.input_res
    # raw BGR uint8 crop — PoseNet's uint8 path normalizes on device
    assert s["image"].shape == (res, res, 3) and s["image"].dtype == np.uint8
    assert s["mask"].shape == (res, res)
    assert s["class_ids"][0] == 0 and s["class_ids"][1] == -1

    # geometric consistency: GT corners projected through the refit pose +
    # bbox_trans must land inside the crop and inside/near the warped mask bbox
    Kint = cfg.data.internal_K_np()
    kp = geo.project_points(Kint, s["rotations"][0], s["translations"][0], CORNERS)
    kp_crop = geo.apply_affine(s["bbox_trans"], kp)
    assert kp_crop.min() > -res * 0.3 and kp_crop.max() < res * 1.3
    ys, xs = np.nonzero(s["mask"] > 0)
    assert len(xs) > 50
    # mask centroid close to corner centroid
    cm = np.array([xs.mean(), ys.mean()])
    ck = kp_crop.mean(0)
    assert np.linalg.norm(cm - ck) < res * 0.15, (cm, ck)


def test_uint8_device_normalize_matches_host(bop_root):
    """PoseNet's uint8 input path (device-side BGR->RGB + ImageNet
    normalize) must match host normalize_fast + the float path."""
    import jax
    import jax.numpy as jnp

    from kd6d_pose_adlp_tpu.data.transforms import normalize_fast
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    cfg = _cfg(bop_root)
    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    rng = np.random.default_rng(0)
    crop = rng.integers(0, 256, (1, cfg.model.input_res,
                                 cfg.model.input_res, 3), dtype=np.uint8)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.model.input_res,
                                    cfg.model.input_res, 3), jnp.float32))
    cls_u8, reg_u8 = net.apply(variables, jnp.asarray(crop), train=False)
    host = normalize_fast(crop[0])[None]
    cls_f, reg_f = net.apply(variables, jnp.asarray(host), train=False)
    np.testing.assert_allclose(np.asarray(cls_u8), np.asarray(cls_f),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_u8), np.asarray(reg_f),
                               rtol=1e-4, atol=2e-4)


def test_prefetch_loader_batches(bop_root):
    cfg = _cfg(bop_root)
    ds = BOPPoseDataset(cfg, cfg.data.train_list, train=True)
    loader = PrefetchLoader(ds, batch_size=2, train=True, seed=0)
    it = iter(loader)
    batch, metas = next(it)
    assert batch.images.shape == (2, 128, 128, 3)
    assert batch.mask.shape == (2, 128, 128)
    assert len(metas) == 2 and "filename" in metas[0]
    batch2, _ = next(it)
    assert batch2.images.shape == (2, 128, 128, 3)


def test_prefetch_loader_eval_yields_all_batches():
    """One-epoch (train=False) prefetch must deliver EVERY batch: a producer
    still building the final batch when the index stream runs out used to
    drop it on the shared stop event (up to num_threads lost eval batches,
    nondeterministically)."""
    import time

    class SlowDS:
        def __len__(self):
            return 7

        def sample(self, idx, seed=0, focus_obj=None):
            time.sleep(0.01)  # widen the exhaustion/put race window
            return dict(image=np.full((4, 4, 3), idx, np.uint8),
                        mask=np.zeros((4, 4), np.int32),
                        class_ids=np.zeros((1,), np.int32),
                        rotations=np.eye(3, dtype=np.float32)[None],
                        translations=np.zeros((1, 3), np.float32),
                        bbox_trans=np.eye(2, 3, dtype=np.float32),
                        meta=dict(filename=f"{idx}"))

    for trial in range(5):
        loader = PrefetchLoader(SlowDS(), batch_size=2, train=False,
                                num_threads=3, depth=2, seed=trial)
        got = list(loader)
        assert len(got) == 4, f"trial {trial}: lost eval batches: {len(got)}/4"


@pytest.fixture(scope="module")
def bop_root_multi(tmp_path_factory):
    """A scene with TWO instances for per-object eval-crop tests."""
    root = tmp_path_factory.mktemp("bop_multi")
    models = root / "models"
    models.mkdir()
    _write_ply(models / "obj_000001.ply", CORNERS)
    with open(root / "bbox.json", "w") as f:
        json.dump([mesh_bbox_corners(CORNERS).tolist()], f)
    scene = root / "train" / "000001"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask_visib").mkdir()
    rng = np.random.default_rng(5)
    img = np.full((480, 640, 3), 60, np.uint8)
    cam = {"0": {"cam_K": K0.reshape(-1).tolist(), "depth_scale": 1.0}}
    gt = {"0": []}
    for j, off in enumerate(((-120.0, 0.0), (130.0, 20.0))):
        R = geo.quaternion2rotation(rng.normal(size=4))
        T = np.array([off[0], off[1], 850.0])
        kp = geo.project_points(K0, R, T, CORNERS.astype(np.float64))
        hull = cv2.convexHull(kp.astype(np.float32)).astype(np.int32)
        cv2.fillConvexPoly(img, hull, (40 + 80 * j, 180, 90))
        mask = np.zeros((480, 640), np.uint8)
        cv2.fillConvexPoly(mask, hull, 255)
        cv2.imwrite(str(scene / "mask_visib" / f"000000_{j:06d}.png"), mask)
        gt["0"].append({"cam_R_m2c": R.reshape(-1).tolist(),
                        "cam_t_m2c": T.reshape(-1).tolist(), "obj_id": 1})
    cv2.imwrite(str(scene / "rgb" / "000000.png"), img)
    with open(scene / "scene_camera.json", "w") as f:
        json.dump(cam, f)
    with open(scene / "scene_gt.json", "w") as f:
        json.dump(gt, f)
    with open(root / "train_list.txt", "w") as f:
        f.write("train/000001/rgb/000000.png")
    return root


def test_per_object_eval_crops(bop_root_multi):
    cfg = _cfg(bop_root_multi)
    ds = BOPPoseDataset(cfg, cfg.data.train_list, train=False)
    items = ds.eval_items()
    assert items == [(0, 0), (0, 1)]
    s0 = ds.sample(0, focus_obj=0)
    s1 = ds.sample(0, focus_obj=1)
    assert s0 is not None and s1 is not None
    # unique eval keys and single-object meta
    assert s0["meta"]["filename"].endswith("#obj0")
    assert s1["meta"]["filename"].endswith("#obj1")
    assert len(s0["meta"]["class_ids"]) == 1
    # the focused object sits in slot 0 and its crop differs per object
    assert s0["class_ids"][0] == 0 and s1["class_ids"][0] == 0
    assert not np.allclose(s0["bbox_trans"], s1["bbox_trans"])
    # each crop's slot-0 pose projects inside its own crop
    res = cfg.model.input_res
    for s in (s0, s1):
        kp = geo.project_points(cfg.data.internal_K_np(), s["rotations"][0],
                                s["translations"][0], CORNERS)
        kp_crop = geo.apply_affine(s["bbox_trans"], kp)
        assert kp_crop.min() > -res * 0.3 and kp_crop.max() < res * 1.3
        # slot-0 instance occupies the crop center region
        ys, xs = np.nonzero(s["mask"] == 1)
        assert len(xs) > 30
        c = np.array([xs.mean(), ys.mean()])
        assert np.linalg.norm(c - kp_crop.mean(0)) < res * 0.2


@pytest.mark.slow
def test_bop_end_to_end_training_step(bop_root):
    """Three optimizer steps driven entirely by the on-disk BOP pipeline."""
    import itertools
    import jax
    from kd6d_pose_adlp_tpu.engine.steps import (build_train_step,
                                                 create_train_state,
                                                 make_optimizer)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    cfg = _cfg(bop_root)
    cfg = cfg.replace(model=ModelConfig(input_res=128, backbone="darknet_tiny_h"),
                      solver=SolverConfig(max_objs=2, ims_per_batch=2, max_pos=32))
    ds = BOPPoseDataset(cfg, cfg.data.train_list, train=True)
    consts = ds.consts()
    loader = iter(PrefetchLoader(ds, batch_size=2, train=True, seed=0))

    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    opt = make_optimizer(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
    step_fn = jax.jit(build_train_step(cfg, None, consts, net, None, opt,
                                       distill=False), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        batch, _ = next(loader)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, None, batch, sub)
        m = jax.device_get(metrics)
        assert np.isfinite(float(m["loss_total"])), (i, m)
    assert int(m["num_pos"]) > 0
