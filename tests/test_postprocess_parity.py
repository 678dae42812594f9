"""Inference postprocess parity: the reference PostProcessor (torch + cv2
RANSAC-EPnP) vs our device voting + RANSAC-EPnP on identical predictions.

Covers the trickiest replicated logic: threshold, per-level quota voting with
the prefix-max box-size scan, inverse crop affine, and the PnP solve."""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kd6d_pose_adlp_tpu.config import Config, ModelConfig, SolverConfig, TestConfig  # noqa: E402
from kd6d_pose_adlp_tpu.data.batch import Batch, TaskConsts  # noqa: E402
from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess  # noqa: E402
from kd6d_pose_adlp_tpu.utils import geometry as geo  # noqa: E402

RES = 128
STRIDES = (8, 16, 32, 64)
SIZES = (32, 64, 128, 256, 512)
N_FG = 15
K_INT = np.array([[572.4114, 0, 325.2611], [0, 573.57043, 242.04899],
                  [0, 0, 1]], np.float32)


def _import_ref():
    # the reference predates NumPy 1.24 (np.float/np.bool aliases)
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    if not hasattr(np, "bool"):
        np.bool = bool  # type: ignore[attr-defined]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("trimesh", "pyrender", "transforms3d", "transforms3d.euler",
                 "geomloss", "psutil", "tensorboardX"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["transforms3d"].euler = sys.modules["transforms3d.euler"]
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = lambda *a, **k: None
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    import importlib
    return (importlib.import_module("models.model"),
            importlib.import_module("postprocess.postprocess"),
            importlib.import_module("libs.poses"))


@pytest.mark.slow
def test_postprocess_pose_parity_with_reference():
    mm, pp, poses_mod = _import_ref()
    rng = np.random.default_rng(0)

    # a plausible scene: GT class 3, pose, corners; predictions decode to the
    # true projections + noise at confident cells
    kp3d = np.stack([np.array([[sx * (30 + c), sy * 25, sz * 40]
                               for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                              np.float32) for c in range(N_FG)])
    cls_gt = 3
    R_gt = geo.quaternion2rotation(rng.normal(size=4)).astype(np.float32)
    T_gt = np.array([20.0, -15.0, 820.0], np.float32)
    Mc = geo.dzi_affine(np.asarray(
        geo.project_points(K_INT, R_gt, T_gt, kp3d[cls_gt])).mean(0), 260.0, RES)

    kp_crop = geo.apply_affine(Mc, geo.project_points(K_INT, R_gt, T_gt, kp3d[cls_gt]))

    from kd6d_pose_adlp_tpu.models import anchors as anchor_lib
    from kd6d_pose_adlp_tpu.models import coder
    anchors = anchor_lib.make_anchors(RES, STRIDES, SIZES[:4])
    A = anchors.shape[0]

    # logits: background everywhere except ~30 random cells for class 3
    logits = np.full((A, N_FG), -8.0, np.float32)
    hot = rng.choice(A, 30, replace=False)
    logits[hot, cls_gt] = rng.uniform(-1.5, 3.0, size=30)
    # regression: encode noisy GT projections for every cell/class
    noisy = kp_crop[None] + rng.normal(scale=1.0, size=(A, 8, 2)).astype(np.float32)
    enc = np.asarray(coder.encode(jnp.asarray(noisy), jnp.asarray(anchors)))
    reg = np.tile(enc[:, None, :], (1, N_FG, 1)).reshape(A, N_FG * 16)

    # ---- reference path (torch, per-level NCHW) ----
    level_hw = [RES // s for s in STRIDES]
    cls_levels, reg_levels, start = [], [], 0
    for g in level_hw:
        n = g * g
        cls_levels.append(torch.from_numpy(
            logits[start:start + n].reshape(1, g, g, N_FG).transpose(0, 3, 1, 2).copy()))
        reg_levels.append(torch.from_numpy(
            reg[start:start + n].reshape(1, g, g, N_FG * 16).transpose(0, 3, 1, 2).copy()))
        start += n

    anchor_gen = mm.make_anchor_generator_atss(list(SIZES), [8, 16, 32, 64, 128])

    class _ImgList:
        sizes = [(RES, RES)]
    feats = [torch.zeros(1, 1, g, g) for g in level_hw]
    ref_anchors = anchor_gen(_ImgList(), feats)

    target = poses_mod.PoseAnnot(
        torch.from_numpy(kp3d), torch.from_numpy(K_INT),
        torch.zeros(RES, RES), torch.LongTensor([cls_gt]),
        torch.from_numpy(R_gt[None]), torch.from_numpy(T_gt.reshape(1, 3, 1)),
        RES, RES, bbox_scale=torch.tensor(1.0),
        bbox_trans=torch.from_numpy(Mc))

    coder_ref = mm.TargetCoder("POINT", list(SIZES), list(STRIDES))
    post_ref = pp.PostProcessor(0.1, coder_ref, 10, 1.0, {})
    results = post_ref(cls_levels, reg_levels, [target], ref_anchors)
    assert results[0], "reference produced no pose"
    score_r, cls_r, R_r, T_r, _ = results[0][0]
    assert cls_r == cls_gt

    # ---- our path ----
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h", input_res=RES),
                 solver=SolverConfig(max_objs=2, max_pos=32),
                 test=TestConfig(max_votes=64, ransac_iters=64))
    consts = TaskConsts.create(K_INT, kp3d, np.full(N_FG, 150.0))
    post = build_postprocess(cfg, consts)
    batch = Batch(
        images=jnp.zeros((1, RES, RES, 3)),
        mask=jnp.zeros((1, RES, RES), jnp.int32),
        class_ids=jnp.asarray([[cls_gt, -1]], jnp.int32),
        rotations=jnp.asarray(np.stack([np.stack([R_gt, np.eye(3, dtype=np.float32)])])),
        translations=jnp.asarray([[T_gt, np.zeros(3, np.float32)]]),
        bbox_trans=jnp.asarray(Mc)[None])
    out = jax.device_get(post(jnp.asarray(logits)[None], jnp.asarray(reg)[None],
                              batch, jax.random.PRNGKey(0)))
    assert bool(out["valid"][0])

    # both solvers see the same votes; poses agree to solver tolerance and
    # both are close to the GT that generated the predictions
    R_o, T_o = np.asarray(out["R"][0]), np.asarray(out["T"][0]).reshape(3)

    def rot_deg(Ra, Rb):
        return np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(Ra).T @ np.asarray(Rb)) - 1) / 2, -1, 1)))

    assert rot_deg(R_r, R_o) < 3.0, rot_deg(R_r, R_o)
    assert np.linalg.norm(np.asarray(T_r).reshape(3) - T_o) < 15.0
    assert rot_deg(R_gt, R_o) < 3.0
    assert np.linalg.norm(T_gt - T_o) < 15.0
    np.testing.assert_allclose(float(out["score"][0]), float(score_r), atol=0.05)
