import jax
import jax.numpy as jnp
import numpy as np

from kd6d_pose_adlp_tpu.models import anchors as anchor_lib
from kd6d_pose_adlp_tpu.models import coder
from kd6d_pose_adlp_tpu.ops.ssc import level_quotas
from kd6d_pose_adlp_tpu.ops.voting import vote_cells, votes_to_internal_frame
from kd6d_pose_adlp_tpu.utils import geometry as geo
from kd6d_pose_adlp_tpu.utils import metrics as M

RES = 64
STRIDES = (8, 16)
SIZES_ALL = (32, 64, 128, 256, 512)


def _mk_votes(scores, pred16):
    return vote_cells(jnp.asarray(scores), jnp.asarray(pred16),
                      input_res=RES, strides=STRIDES, all_sizes=SIZES_ALL,
                      confidence_th=0.1, positive_num=10, positive_lambda=1.0,
                      max_votes=16)


def test_vote_cells_respects_threshold_and_quota():
    A = (RES // 8) ** 2 + (RES // 16) ** 2
    rng = np.random.default_rng(0)
    scores = np.zeros((1, A), np.float32)
    # 20 candidate cells in level 0 with descending scores
    cand = rng.choice((RES // 8) ** 2, 20, replace=False)
    scores[0, cand] = np.linspace(0.9, 0.2, 20)
    # regression decoding to a ~40px box => quotas follow the SSC formula
    pred16 = np.zeros((1, A, 16), np.float32)
    anchors = anchor_lib.make_anchors(RES, STRIDES, SIZES_ALL[:2])
    kp = np.array([[10, 10], [50, 10], [50, 50], [10, 50]] * 2, np.float32)
    enc_all = np.asarray(coder.encode(
        jnp.broadcast_to(jnp.asarray(kp)[None], (A, 8, 2)), jnp.asarray(anchors)))
    pred16[0] = enc_all

    votes = _mk_votes(scores, pred16)
    v = np.asarray(votes.valid[0])
    s = np.asarray(votes.score[0])
    assert v.any()
    # all selected scores above threshold and sorted-compact (valid first)
    assert (s[v] > 0.1).all()
    assert not v[np.argmin(v.astype(int)):].any() or v.all()
    # quota: nk for boxSize=span(kp)=40+... vs level sizes over the FULL list
    span = max(kp[:, 0].max() - kp[:, 0].min(), kp[:, 1].max() - kp[:, 1].min())
    nk = np.asarray(level_quotas(jnp.asarray([[span]]), SIZES_ALL, 10, 1.0))[0, :, 0]
    n_lvl0 = int(v.sum())
    assert n_lvl0 <= nk[0] + nk[1]
    assert float(np.asarray(votes.box_size[0])) > 0


def test_votes_to_internal_frame_inverts_crop():
    A = (RES // 8) ** 2 + (RES // 16) ** 2
    M2 = geo.dzi_affine(np.array([320.0, 240.0]), 300.0, RES)
    anchors = anchor_lib.make_anchors(RES, STRIDES, SIZES_ALL[:2])
    # target internal points, mapped to crop, encoded
    rng = np.random.default_rng(1)
    pts_internal = rng.uniform(200, 400, size=(8, 2)).astype(np.float32)
    pts_crop = geo.apply_affine(M2, pts_internal)
    enc = np.asarray(coder.encode(
        jnp.broadcast_to(jnp.asarray(pts_crop)[None], (A, 8, 2)),
        jnp.asarray(anchors)))
    scores = np.full((1, A), 0.5, np.float32)
    votes = _mk_votes(scores, enc[None])
    kp_int = np.asarray(votes_to_internal_frame(
        votes, jnp.asarray(M2)[None]))
    valid = np.asarray(votes.valid[0])
    for i in np.nonzero(valid)[0]:
        np.testing.assert_allclose(kp_int[0, i], pts_internal, atol=0.1)


def test_compute_pose_diff_symmetric_closest_point():
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    pts = np.array([[10, 0, 0], [-10, 0, 0], [0, 10, 0], [0, -10, 0],
                    [0, 0, 10], [0, 0, -10]], np.float64)
    R1 = np.eye(3)
    T = np.array([0, 0, 500.0])
    # 180-degree rotation about z maps the point set to itself
    R2 = geo.euler2mat(np.pi, 0, 0, "szyx")
    e3_sym, _ = M.compute_pose_diff(pts, K, R1, T, R2, T, is_sym=True)
    e3_asym, _ = M.compute_pose_diff(pts, K, R1, T, R2, T, is_sym=False)
    assert e3_sym < 1e-9
    assert e3_asym > 1.0


def test_auc_metric():
    errs = [0.0, 50.0, 200.0]
    # per sample AUC contributions over [0,100]: 1.0, 0.5, 0.0
    np.testing.assert_allclose(M.auc_metric(errs, 100.0), 0.5, atol=1e-3)
    assert M.auc_metric([], 100.0) == 0.0


def test_evaluate_pose_predictions_end_to_end_dict():
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    mesh = np.random.default_rng(0).uniform(-40, 40, (100, 3))
    R = np.eye(3)
    T = np.array([0, 0, 700.0])
    preds = {
        "a.png": {"meta": {"K": K.tolist(), "class_ids": [0],
                           "rotations": [R.tolist()], "translations": [T.tolist()]},
                  "pred": [[0.9, 0, R.tolist(), T.reshape(3, 1).tolist()]]},
        "b.png": {"meta": {"K": K.tolist(), "class_ids": [0],
                           "rotations": [R.tolist()], "translations": [T.tolist()]},
                  "pred": []},  # miss -> penalties
    }
    res = M.evaluate_pose_predictions(preds, 2, [mesh], [100.0], {})
    assert res["adi_per_class"][0]["ADI.10d"] == 50.0  # one hit, one miss
    assert res["rep_per_class"][0]["REP05px"] == 50.0
    table = M.format_accuracy_table(res)
    assert "ADI.10d" in table and "cls_00" in table


def test_drawing_helpers_produce_images():
    """Keypoint + contour overlays (reference libs/utils.py:555-713): shape
    preserved, pixels touched, out-of-frame/NaN points ignored."""
    from kd6d_pose_adlp_tpu.tools.visualizer import (draw_2d_keypoints,
                                                     draw_mesh_contour)
    img = np.zeros((120, 160, 3), np.uint8)
    kp = np.array([[40.0, 50.0], [80.0, 30.0], [np.nan, 1.0], [9999.0, 9999.0]])
    out = draw_2d_keypoints(img, kp, scores=np.array([1.0, 0.2, 1.0, 1.0]))
    assert out.shape == img.shape and out.sum() > 0 and img.sum() == 0

    K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    R = np.eye(3)
    T = np.array([0.0, 0.0, 1.0])
    verts = np.random.default_rng(0).uniform(-0.1, 0.1, (500, 3))
    out2 = draw_mesh_contour(img, R, T, K, verts)
    assert out2.shape == img.shape and out2.sum() > 0
