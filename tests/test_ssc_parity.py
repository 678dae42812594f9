"""SSC target-assignment parity with the reference prepare_targets.

The random subsets differ (torch.randperm vs Gumbel ranks), but everything
else is deterministic and must match exactly: which cells are candidates,
the background/ignore partition, and the per-(gt, level) positive counts
min(nk, candidates)."""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kd6d_pose_adlp_tpu.models import anchors as anchor_lib  # noqa: E402
from kd6d_pose_adlp_tpu.ops import ssc  # noqa: E402
from kd6d_pose_adlp_tpu.utils import geometry as geo  # noqa: E402

RES = 128
STRIDES = [8, 16, 32, 64]
SIZES = [32, 64, 128, 256, 512]
N_FG = 15
K_INT = np.array([[572.4114, 0, 325.2611], [0, 573.57043, 242.04899],
                  [0, 0, 1]], np.float32)


def _import_ref():
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
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    torch.Tensor.cuda = lambda self, *a, **k: self
    import importlib
    return (importlib.import_module("models.model"),
            importlib.import_module("losses.loss"),
            importlib.import_module("libs.poses"))


def test_ssc_partition_and_counts_match_reference():
    mm, ll, poses_mod = _import_ref()
    rng = np.random.default_rng(0)

    kp3d = np.stack([np.array([[sx * 35, sy * 28, sz * 45]
                               for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                              np.float32)] * N_FG)
    cls_gt = 5
    R_gt = geo.quaternion2rotation(rng.normal(size=4)).astype(np.float32)
    T_gt = np.array([0.0, 10.0, 750.0], np.float32)
    kp_int = geo.project_points(K_INT, R_gt, T_gt, kp3d[cls_gt])
    Mc = geo.dzi_affine(kp_int.mean(0), 240.0, RES)
    kp_crop = geo.apply_affine(Mc, kp_int)

    # instance mask: filled hull of the projected corners in the crop
    mask = np.zeros((RES, RES), np.int32)
    import cv2
    cv2.fillConvexPoly(mask, cv2.convexHull(
        kp_crop.astype(np.float32)).astype(np.int32), 1)

    # ---- reference assignment ----
    target = poses_mod.PoseAnnot(
        torch.from_numpy(kp3d), torch.from_numpy(K_INT),
        torch.from_numpy(mask.astype(np.float32)), torch.LongTensor([cls_gt]),
        torch.from_numpy(R_gt[None]), torch.from_numpy(T_gt.reshape(1, 3, 1)),
        RES, RES, bbox_scale=torch.tensor(1.0),
        bbox_trans=torch.from_numpy(Mc))
    anchor_gen = mm.make_anchor_generator_atss(SIZES, SIZES[:0] + [8, 16, 32, 64, 128])

    class _ImgList:
        sizes = [(RES, RES)]
    feats = [torch.zeros(1, 1, RES // s, RES // s) for s in STRIDES]
    ref_anchors = anchor_gen(_ImgList(), feats)

    loss_ref = ll.PoseLossDzi(
        2.0, 0.25, SIZES, [8, 16, 32, 64, 128], "SSC", 10, 1.0, 9,
        list(K_INT.reshape(-1).astype(float)), [150.0] * N_FG,
        mm.TargetCoder("POINT", SIZES, [8, 16, 32, 64, 128]))
    torch.manual_seed(0)
    labels_ref = loss_ref.prepare_targets([target], ref_anchors)[0][0].numpy()

    # ---- ours ----
    G = 2
    class_ids = np.full((1, G), -1, np.int32)
    class_ids[0, 0] = cls_gt
    rots = np.zeros((1, G, 3, 3), np.float32)
    rots[0, 0] = R_gt
    trans = np.zeros((1, G, 3), np.float32)
    trans[0, 0] = T_gt
    kp2d = np.zeros((1, G, 8, 2), np.float32)
    kp2d[0, 0] = kp_crop
    labels, _ = ssc.ssc_assign(
        jax.random.PRNGKey(0), jnp.asarray(mask[None]), jnp.asarray(class_ids),
        jnp.asarray(kp2d), input_res=RES, strides=tuple(STRIDES),
        sizes=(32, 64, 128, 256), positive_num=10, positive_lambda=1.0)
    labels = np.asarray(labels)[0]

    # deterministic structure must match exactly: the background set and the
    # in-mask set (positives ∪ ignore). WHICH in-mask cells become positive
    # is the random subset and legitimately differs between RNGs.
    np.testing.assert_array_equal(labels == 0, labels_ref == 0)   # background
    np.testing.assert_array_equal(labels != 0, labels_ref != 0)   # in-mask
    # positives carry the same class id
    assert set(np.unique(labels[labels > 0])) <= {cls_gt + 1}
    assert set(np.unique(labels_ref[labels_ref > 0])) <= {cls_gt + 1}
    # per-level positive counts equal (quota is deterministic)
    for s, e in anchor_lib.level_slices(RES, tuple(STRIDES)):
        n_ours = int((labels[s:e] > 0).sum())
        n_ref = int((labels_ref[s:e] > 0).sum())
        assert n_ours == n_ref, (s, e, n_ours, n_ref)
    assert (labels > 0).sum() > 0


def test_topk_selection_equals_rank_selection():
    """The top_k-based sampler must select exactly the cells the
    rank-of-argsort formulation selects (same random scores, same quotas)."""
    import jax

    from kd6d_pose_adlp_tpu.ops.ssc import _rank_in_segment, _select_k_smallest

    rng = np.random.default_rng(0)
    for trial in range(4):
        B, Al, G, pn = 3, 50, 4, 10
        r = rng.uniform(0, 1, (B, Al, G)).astype(np.float32)
        # push some cells to +inf like non-candidates
        r[rng.uniform(size=r.shape) < 0.6] = 1e9
        nk = rng.integers(0, pn + 1, (B, G)).astype(np.int32)

        ranks = jax.vmap(_rank_in_segment)(jnp.asarray(r))
        ref = np.asarray(ranks) < nk[:, None, :]
        got = np.asarray(_select_k_smallest(jnp.asarray(r), jnp.asarray(nk), pn))
        np.testing.assert_array_equal(got, ref, err_msg=str(trial))
