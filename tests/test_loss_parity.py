"""Loss-math parity against the reference's own torch loss code."""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

import jax.numpy as jnp  # noqa: E402

from kd6d_pose_adlp_tpu.models import coder  # noqa: E402
from kd6d_pose_adlp_tpu.ops.focal import sigmoid_focal_loss  # noqa: E402
from kd6d_pose_adlp_tpu.ops.object_space import (  # noqa: E402
    object_space_loss, select_class_pred)
from kd6d_pose_adlp_tpu.utils import geometry as geo  # noqa: E402

K_INT = np.array([[572.4114, 0, 325.2611], [0, 573.57043, 242.04899],
                  [0, 0, 1]], np.float32)
N_FG = 15


def _import_losses():
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
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
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        tv.ops = ops
    # the reference hardcodes .cuda() in TargetCoder.encode; run it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    import importlib
    mm = importlib.import_module("models.model")
    ll = importlib.import_module("losses.loss")
    return mm, ll


def test_object_space_loss_matches_reference():
    mm, ll = _import_losses()
    rng = np.random.default_rng(0)
    n = 24
    diameters = rng.uniform(100, 300, N_FG).astype(np.float32)

    # per-cell data: class, anchors (reference xyxy vs our cxcywh), crop
    # affines, predicted 16-vectors, GT corners in camera frame
    cls = rng.integers(0, N_FG, n).astype(np.int64)
    cx = rng.uniform(50, 200, n)
    cy = rng.uniform(50, 200, n)
    side = rng.choice([32.0, 64.0, 128.0], n)
    anchors_xyxy = np.stack([cx - (side - 1) / 2, cy - (side - 1) / 2,
                             cx + (side - 1) / 2, cy + (side - 1) / 2], 1)
    anchors_ours = np.stack([cx, cy, side, side], 1).astype(np.float32)
    bbox_trans = np.stack([geo.dzi_affine(np.array([300 + 10 * i, 200 + 5 * i]),
                                          260.0 + i, 256) for i in range(n)])
    pred = rng.normal(scale=0.3, size=(n, N_FG * 16)).astype(np.float32)
    kp3d_cam = rng.normal(scale=60, size=(n, 8, 3)).astype(np.float32)
    kp3d_cam[..., 2] += 800

    loss_ref = ll.PoseLossDzi(
        2.0, 0.25, [32, 64, 128, 256, 512], [8, 16, 32, 64, 128], "SSC", 10,
        1.0, 9, list(K_INT.reshape(-1).astype(float)), list(map(float, diameters)),
        mm.TargetCoder("POINT", [32, 64, 128, 256, 512], [8, 16, 32, 64, 128]))
    # ObjectSpaceLoss expects internal_K already tensorized (prepare_targets
    # normally does it, losses/loss.py:255-256)
    loss_ref.internal_K = torch.from_numpy(K_INT)
    ref_val = loss_ref.ObjectSpaceLoss(
        torch.from_numpy(pred), torch.from_numpy(kp3d_cam),
        torch.from_numpy(cls), torch.from_numpy(anchors_xyxy.astype(np.float32)),
        torch.from_numpy(bbox_trans.astype(np.float32)))

    pred16 = select_class_pred(jnp.asarray(pred)[None],
                               jnp.asarray(cls.astype(np.int32))[None])
    inv_bt = coder.invert_bbox_trans(jnp.asarray(bbox_trans.astype(np.float32)))
    pred_xy = coder.decode(pred16[0], jnp.asarray(anchors_ours), inv_bt)
    ours = object_space_loss(
        pred_xy[None], jnp.asarray(kp3d_cam)[None],
        jnp.asarray(cls.astype(np.int32))[None], jnp.ones((1, n), bool),
        jnp.asarray(np.linalg.inv(K_INT)), jnp.asarray(diameters))
    np.testing.assert_allclose(float(ours), float(ref_val), rtol=2e-4)


def test_focal_loss_matches_reference_module():
    mm, ll = _import_losses()
    rng = np.random.default_rng(1)
    logits = rng.normal(scale=3, size=(200, N_FG)).astype(np.float32)
    labels = rng.integers(0, N_FG + 1, 200).astype(np.int64)  # 0=bg, 1..15
    ref = ll.SigmoidFocalLoss(2.0, 0.25)(torch.from_numpy(logits),
                                         torch.from_numpy(labels))
    ours = sigmoid_focal_loss(jnp.asarray(logits),
                              jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_target_coder_matches_reference():
    mm, ll = _import_losses()
    rng = np.random.default_rng(2)
    n = 12
    ref_coder = mm.TargetCoder("POINT", [32, 64, 128, 256, 512],
                               [8, 16, 32, 64, 128])
    cx = rng.uniform(50, 200, n)
    cy = rng.uniform(50, 200, n)
    side = rng.choice([32.0, 64.0], n)
    anchors_xyxy = np.stack([cx - (side - 1) / 2, cy - (side - 1) / 2,
                             cx + (side - 1) / 2, cy + (side - 1) / 2],
                            1).astype(np.float32)
    anchors_ours = np.stack([cx, cy, side, side], 1).astype(np.float32)
    bbox_trans = np.stack([geo.dzi_affine(np.array([300.0, 220.0]), 250.0, 256)
                           for _ in range(n)]).astype(np.float32)

    # encode: project GT corners through pose + crop affine, normalize
    R = geo.quaternion2rotation(rng.normal(size=4)).astype(np.float32)
    T = np.array([10.0, -5.0, 900.0], np.float32)
    gt3d = rng.normal(scale=40, size=(n, 8, 3)).astype(np.float32)
    enc_ref = ref_coder.encode(
        torch.from_numpy(K_INT), torch.from_numpy(gt3d),
        torch.from_numpy(np.tile(R, (n, 1, 1))),
        torch.from_numpy(np.tile(T.reshape(3, 1), (n, 1, 1))),
        torch.from_numpy(anchors_xyxy), torch.from_numpy(bbox_trans)).numpy()
    kp2d = coder.project_corners(jnp.asarray(K_INT),
                                 jnp.asarray(np.tile(R, (n, 1, 1))),
                                 jnp.asarray(np.tile(T, (n, 1))),
                                 jnp.asarray(gt3d), jnp.asarray(bbox_trans))
    enc_ours = coder.encode(kp2d, jnp.asarray(anchors_ours))
    np.testing.assert_allclose(np.asarray(enc_ours), enc_ref, rtol=1e-4, atol=1e-4)

    # decode incl. inverse bbox_trans
    pred = rng.normal(scale=0.4, size=(n, 16)).astype(np.float32)
    dec_ref = ref_coder.decode(torch.from_numpy(pred),
                               torch.from_numpy(anchors_xyxy),
                               torch.from_numpy(bbox_trans)).numpy()  # (n,16) [x8,y8]
    inv_bt = coder.invert_bbox_trans(jnp.asarray(bbox_trans))
    dec_ours = np.asarray(coder.decode(jnp.asarray(pred),
                                       jnp.asarray(anchors_ours), inv_bt))
    dec_ours_flat = np.concatenate([dec_ours[..., 0], dec_ours[..., 1]], -1)
    np.testing.assert_allclose(dec_ours_flat, dec_ref, rtol=1e-4, atol=2e-3)
