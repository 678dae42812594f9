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


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([[1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                     [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                     [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def test_compute_pose_diff_batch_matches_scalar_oracle():
    """The evaluator scores whole classes via the batched/GEMM/KD-tree path;
    it must reproduce the per-image scalar oracle exactly (both the plain ADD
    and the symmetric closest-point ADI), including per-image intrinsics."""
    rng = np.random.default_rng(7)
    mesh = rng.normal(size=(1500, 3)) * 40  # > max_pts: exercises subsampling
    N = 17
    Ks = np.stack([np.array([[572.4 + rng.normal(), 0, 325.0],
                             [0, 573.5 + rng.normal(), 242.0],
                             [0, 0, 1.0]]) for _ in range(N)])
    gtR = np.stack([_rand_rot(rng) for _ in range(N)])
    pR = np.stack([_rand_rot(rng) for _ in range(N)])
    gtT = rng.normal(size=(N, 3)) * 50 + [0, 0, 800]
    pT = gtT + rng.normal(size=(N, 3)) * 5
    for is_sym in (False, True):
        e3b, e2b = M.compute_pose_diff_batch(mesh, Ks, gtR, gtT, pR, pT,
                                             is_sym=is_sym)
        for i in range(N):
            e3, e2 = M.compute_pose_diff(mesh, Ks[i], gtR[i], gtT[i],
                                         pR[i], pT[i], is_sym=is_sym)
            assert abs(e3b[i] - e3) < 1e-9, (is_sym, i)
            assert abs(e2b[i] - e2) < 1e-9, (is_sym, i)


def test_evaluate_pose_predictions_matches_per_image_scoring():
    """End-to-end: the batched evaluate_pose_predictions must agree with a
    naive per-image rescoring of the same predictions dict (hit + miss mix,
    symmetric and non-symmetric classes)."""
    rng = np.random.default_rng(11)
    n_img, n_cls = 40, 3
    meshes = [rng.normal(size=(300, 3)) * 40 for _ in range(n_cls)]
    diams = [120.0, 140.0, 160.0]
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    preds = {}
    for i in range(n_img):
        c = int(rng.integers(0, n_cls))
        R, T = _rand_rot(rng), rng.normal(size=3) * 40 + [0, 0, 700]
        hit = rng.random() < 0.7
        p = []
        if hit:
            p = [[0.9, c, (R + rng.normal(size=(3, 3)) * 0.02).tolist(),
                  (T + rng.normal(size=3) * 8).reshape(3, 1).tolist(), []]]
        preds[f"im{i}"] = {
            "meta": {"K": K.tolist(), "width": 640, "height": 480,
                     "class_ids": [c], "rotations": [R.tolist()],
                     "translations": [T.tolist()]},
            "pred": p}
    sym = {1: ("Z", 180)}
    res = M.evaluate_pose_predictions(preds, n_cls + 1, meshes, diams, sym)

    # naive rescoring with the scalar oracle
    for clsid in range(n_cls):
        errs_adi, errs_rep, errs_abs = [], [], []
        for item in preds.values():
            if clsid not in item["meta"]["class_ids"]:
                continue
            gtR = np.asarray(item["meta"]["rotations"][0])
            gtT = np.asarray(item["meta"]["translations"][0])
            if item["pred"]:
                e3, e2 = M.compute_pose_diff(
                    meshes[clsid], K, gtR, gtT,
                    np.asarray(item["pred"][0][2]),
                    np.asarray(item["pred"][0][3]), is_sym=clsid in sym)
                errs_adi.append(e3 / diams[clsid])
                errs_abs.append(e3)
                errs_rep.append(e2)
            else:
                errs_adi.append(1.0)
                errs_abs.append(1e10)
                errs_rep.append(50.0)
        if not errs_adi:
            continue
        for t in M.THRESHOLDS_ADI:
            key = "ADI" + (f"{t:.2f}d").lstrip("0")
            want = 100.0 * (np.asarray(errs_adi) < t).mean()
            assert abs(res["adi_per_class"][clsid][key] - want) < 1e-9
        for t in M.THRESHOLDS_REP:
            want = 100.0 * (np.asarray(errs_rep) < t).mean()
            assert abs(res["rep_per_class"][clsid][f"REP{t:02d}px"] - want) < 1e-9
        want_auc = 100.0 * M.auc_metric(errs_abs, 100.0)
        assert abs(res["auc_per_class"][clsid]["AUC    "] - want_auc) < 1e-9
