"""Box IoU / fixed-shape NMS vs torchvision (the reference's implementation)."""
import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.ops.boxes import box_iou, ml_nms, nms


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_box_iou_matches_reference_convention():
    a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])   # 10x10 under the +1 convention
    b = jnp.asarray([[5.0, 5.0, 14.0, 14.0], [20.0, 20.0, 29.0, 29.0]])
    got = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(got[0, 0], 25.0 / 175.0, rtol=1e-6)
    assert got[0, 1] == 0.0


def _np_greedy_nms(boxes, scores, iou_th):
    """Classic greedy NMS in plain NumPy (torchvision is not in this image;
    this is the same algorithm its CUDA/C++ op implements), with the
    reference's +1 area convention."""
    order = np.argsort(-scores)
    area = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    keep, dead = [], np.zeros(len(boxes), bool)
    for i in order:
        if dead[i]:
            continue
        keep.append(int(i))
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt + 1, 0, None)
        iou = wh[:, 0] * wh[:, 1] / (area[i] + area - wh[:, 0] * wh[:, 1])
        dead |= iou > iou_th
    return sorted(keep)


def test_nms_matches_numpy_greedy_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        boxes = _rand_boxes(rng, 32)
        scores = rng.uniform(0, 1, 32).astype(np.float32)
        keep = np.asarray(jax.jit(nms, static_argnames="iou_th")(
            jnp.asarray(boxes), jnp.asarray(scores), iou_th=0.5))
        ours = sorted(np.nonzero(keep)[0].tolist())
        ref = _np_greedy_nms(boxes, scores, 0.5)
        assert ours == ref, (trial, ours, ref)


def test_nms_respects_valid_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms(boxes, scores, 0.5,
                          valid=jnp.asarray([False, True, True])))
    assert keep.tolist() == [False, True, True]


def test_ml_nms_keeps_cross_class_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    labels = jnp.asarray([0, 1])
    keep = np.asarray(ml_nms(boxes, scores, labels, 0.5))
    assert keep.tolist() == [True, True]
    keep_same = np.asarray(ml_nms(boxes, scores, jnp.asarray([0, 0]), 0.5))
    assert keep_same.tolist() == [True, False]
