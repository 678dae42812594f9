import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.ops.focal import sigmoid_focal_loss
from kd6d_pose_adlp_tpu.ops.object_space import (
    image_space_loss, object_space_loss, select_class_pred, smooth_l1)
from kd6d_pose_adlp_tpu.ops import ssc


def _np_focal(logits, targets, gamma=2.0, alpha=0.25, eps=1e-4):
    """Oracle: the documented focal formula (losses/loss.py:20-40) in NumPy."""
    C = logits.shape[1]
    ids = np.arange(1, C + 1)[None, :]
    t = targets[:, None]
    p = np.clip(1 / (1 + np.exp(-logits)), eps, 1 - eps)
    term1 = (1 - p) ** gamma * np.log(p)
    term2 = p ** gamma * np.log(1 - p)
    loss = (-(t == ids).astype(float) * alpha * term1
            - ((t != ids) & (t >= 0)).astype(float) * (1 - alpha) * term2)
    return loss.sum()


def test_focal_matches_formula_and_ignores_minus_one():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(50, 15)).astype(np.float32) * 3
    targets = rng.integers(-1, 16, size=(50,)).astype(np.int32)
    ours = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = _np_focal(logits, targets)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # rows with -1 contribute exactly zero
    drop = targets != -1
    ours2 = float(sigmoid_focal_loss(jnp.asarray(logits[drop]), jnp.asarray(targets[drop])))
    np.testing.assert_allclose(ours, ours2, rtol=1e-6)


def test_smooth_l1():
    x = jnp.asarray([0.0, 0.5, 2.0, -3.0])
    y = jnp.zeros(4)
    np.testing.assert_allclose(np.asarray(smooth_l1(x, y)), [0, 0.125, 1.5, 2.5])


def test_select_class_pred():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(2, 4, 3 * 16)).astype(np.float32)
    cls = np.array([[0, 1, 2, 0], [2, 2, 1, 0]], np.int32)
    out = np.asarray(select_class_pred(jnp.asarray(pred), jnp.asarray(cls)))
    for b in range(2):
        for a_ in range(4):
            np.testing.assert_allclose(out[b, a_], pred[b, a_].reshape(3, 16)[cls[b, a_]])


def test_object_space_loss_zero_when_pred_projects_exactly():
    """If predicted 2D keypoints are the exact projections of the GT 3D corners,
    the ray-projection residual is zero."""
    rng = np.random.default_rng(2)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    inv_K = np.linalg.inv(K).astype(np.float32)
    corners = rng.uniform(-50, 50, size=(8, 3)).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.array([0, 0, 800.0], np.float32)
    cam = (R @ corners.T + T[:, None]).T  # (8,3) camera frame
    uv = (K @ cam.T)
    xy = (uv[:2] / uv[2:]).T  # exact projections
    pred_xy = jnp.asarray(xy)[None, None]          # (1,1,8,2)
    kp3d_cam = jnp.asarray(cam)[None, None]        # (1,1,8,3)
    loss = object_space_loss(pred_xy, kp3d_cam, jnp.zeros((1, 1), jnp.int32),
                             jnp.ones((1, 1), bool), jnp.asarray(inv_K),
                             jnp.asarray([100.0]))
    assert float(loss) < 1e-6
    # perturbed predictions give positive loss that grows with the error
    l1 = float(object_space_loss(pred_xy + 1.0, kp3d_cam, jnp.zeros((1, 1), jnp.int32),
                                 jnp.ones((1, 1), bool), jnp.asarray(inv_K),
                                 jnp.asarray([100.0])))
    l2 = float(object_space_loss(pred_xy + 3.0, kp3d_cam, jnp.zeros((1, 1), jnp.int32),
                                 jnp.ones((1, 1), bool), jnp.asarray(inv_K),
                                 jnp.asarray([100.0])))
    assert 0 < l1 < l2
    # masked-out cells contribute nothing
    l3 = float(object_space_loss(pred_xy + 3.0, kp3d_cam, jnp.zeros((1, 1), jnp.int32),
                                 jnp.zeros((1, 1), bool), jnp.asarray(inv_K),
                                 jnp.asarray([100.0])))
    assert l3 == 0.0


def test_image_space_loss_basic():
    pred = jnp.zeros((1, 2, 8, 2))
    tgt = jnp.ones((1, 2, 8, 2)) * 0.25
    mask = jnp.asarray([[True, False]])
    # per-coord: smooth_l1(2*0, 2*0.25)=0.5*0.5^2=0.125; /2 scaling => 0.0625
    val = float(image_space_loss(pred, tgt, mask))
    np.testing.assert_allclose(val, 0.0625, rtol=1e-6)


def test_level_quotas_formula():
    spans = jnp.asarray([[64.0]])
    nk = np.asarray(ssc.level_quotas(spans, (32, 64, 128, 256), 10, 1.0))[0, :, 0]
    # manual: dk = |log2(64/sz)| = [1,0,1,2]; w = exp(-dk^2) = [e^-1,1,e^-1,e^-4]
    w = np.exp(-np.array([1.0, 0.0, 1.0, 4.0]))
    expect = (10 * w / w.sum() + 0.5).astype(int)
    np.testing.assert_array_equal(nk, expect)


def test_ssc_assign_respects_quota_and_mask():
    rng = jax.random.PRNGKey(0)
    B, G, res = 2, 2, 64
    strides, sizes = (8, 16), (32, 64)
    mask = np.zeros((B, res, res), np.int32)
    mask[0, 8:40, 8:40] = 1       # object 1 occupies a block
    mask[1, 0:24, 0:24] = 1
    mask[1, 40:64, 40:64] = 2     # second object on image 1
    class_ids = np.array([[3, -1], [5, 7]], np.int32)
    # corners projecting to boxes of roughly the mask extents
    kp2d = np.zeros((B, G, 8, 2), np.float32)
    kp2d[0, 0] = np.array([[8, 8], [40, 40]] * 4, np.float32)
    kp2d[1, 0] = np.array([[0, 0], [24, 24]] * 4, np.float32)
    kp2d[1, 1] = np.array([[40, 40], [64, 64]] * 4, np.float32)

    labels, matched = ssc.ssc_assign(
        rng, jnp.asarray(mask), jnp.asarray(class_ids), jnp.asarray(kp2d),
        input_res=res, strides=strides, sizes=sizes,
        positive_num=10, positive_lambda=1.0)
    labels = np.asarray(labels)
    matched = np.asarray(matched)
    A = (res // 8) ** 2 + (res // 16) ** 2
    assert labels.shape == (B, A)

    # positives only where the mask has that instance
    anchors = np.asarray(
        __import__("kd6d_pose_adlp_tpu.models.anchors", fromlist=["make_anchors"])
        .make_anchors(res, strides, sizes))
    cx = np.clip(anchors[:, 0], 0, res - 1).astype(int)
    cy = np.clip(anchors[:, 1], 0, res - 1).astype(int)
    for b in range(B):
        mv = mask[b, cy, cx]
        pos = labels[b] > 0
        assert (mv[pos] > 0).all()
        # labels match the instance the anchor sits on
        np.testing.assert_array_equal(labels[b][pos], class_ids[b][mv[pos] - 1] + 1)
        # in-mask unselected cells are ignored (-1)
        assert set(np.unique(labels[b][(mv > 0) & ~pos])) <= {-1}
        # out-of-mask cells are background 0
        assert (labels[b][mv == 0] == 0).all()

    # quota bound: positives per (gt, level) <= nk
    spans = np.asarray(ssc.gt_box_spans(jnp.asarray(kp2d), jnp.asarray(class_ids >= 0)))
    nk = np.asarray(ssc.level_quotas(jnp.asarray(spans), sizes, 10, 1.0))
    from kd6d_pose_adlp_tpu.models.anchors import level_slices
    for b in range(B):
        for li, (s, e) in enumerate(level_slices(res, strides)):
            for g in range(G):
                if class_ids[b, g] < 0:
                    continue
                cnt = int(((labels[b, s:e] == class_ids[b, g] + 1)
                           & (matched[b, s:e] == g)).sum())
                assert cnt <= nk[b, li, g]


def test_ssc_assign_is_random_but_reproducible():
    mask = np.zeros((1, 64, 64), np.int32)
    mask[0, :32, :32] = 1
    class_ids = np.array([[0]], np.int32)
    kp2d = np.tile(np.array([[0, 0], [32, 32]] * 4, np.float32), (1, 1, 1, 1))
    args = (jnp.asarray(mask), jnp.asarray(class_ids), jnp.asarray(kp2d))
    kw = dict(input_res=64, strides=(8, 16), sizes=(32, 64),
              positive_num=10, positive_lambda=1.0)
    l1, _ = ssc.ssc_assign(jax.random.PRNGKey(1), *args, **kw)
    l2, _ = ssc.ssc_assign(jax.random.PRNGKey(1), *args, **kw)
    l3, _ = ssc.ssc_assign(jax.random.PRNGKey(2), *args, **kw)
    assert (np.asarray(l1) == np.asarray(l2)).all()
    assert (np.asarray(l1) != np.asarray(l3)).any()
