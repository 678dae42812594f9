"""Fast (single-warp) host pipeline vs the reference-faithful two-warp path.

The fast path (`DataConfig.fast_pipeline`) composes the internal-frame and
DZI affines into ONE raw->crop warp and augments the crop instead of the
640x480 frame (data/pipeline.py `sample`). Annotations must be EXACT
(identical pose math); pixels may differ only by single-vs-double bilinear
resampling; the two-warp chain's border semantics (outside the internal
frame = black/background) must be reproduced."""
import dataclasses

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from kd6d_pose_adlp_tpu.data.pipeline import BOPPoseDataset

from test_data_pipeline import bop_root, _cfg  # noqa: F401 (fixture reuse)


def _pair(root, train, **data_kw):
    cfg = _cfg(root)
    slow = BOPPoseDataset(cfg, cfg.data.train_list, train=train)
    cfg_f = cfg.replace(data=dataclasses.replace(
        cfg.data, fast_pipeline=True, **data_kw))
    fast = BOPPoseDataset(cfg_f, cfg_f.data.train_list, train=train)
    assert fast.fast and not slow.fast
    return slow, fast


@pytest.mark.parametrize("train", [True, False])
def test_fast_matches_slow(bop_root, train):  # noqa: F811
    slow, fast = _pair(bop_root, train)
    checked = 0
    for i in range(4):
        for seed in (1, 2):
            a, b = slow.sample(i, seed=seed), fast.sample(i, seed=seed)
            assert (a is None) == (b is None)
            if a is None:
                continue
            checked += 1
            # annotation contract: exact (identical pose math, same rng use)
            np.testing.assert_array_equal(a["class_ids"], b["class_ids"])
            np.testing.assert_allclose(a["rotations"], b["rotations"], atol=1e-6)
            np.testing.assert_allclose(a["translations"], b["translations"], atol=1e-5)
            np.testing.assert_allclose(a["bbox_trans"], b["bbox_trans"], atol=1e-5)
            assert a["meta"]["filename"] == b["meta"]["filename"]
            # pixels: single vs double bilinear only
            d = np.abs(a["image"].astype(np.int32) - b["image"].astype(np.int32))
            assert d.mean() < 4.0, d.mean()
            assert (a["mask"] != b["mask"]).mean() < 0.02
    assert checked >= 6


def test_fast_focus_obj_matches_slow(bop_root):  # noqa: F811
    slow, fast = _pair(bop_root, train=False)
    a = slow.sample(1, seed=0, focus_obj=0)
    b = fast.sample(1, seed=0, focus_obj=0)
    assert a is not None and b is not None
    np.testing.assert_array_equal(a["class_ids"], b["class_ids"])
    np.testing.assert_allclose(a["meta"]["rotations"][0],
                               b["meta"]["rotations"][0], atol=1e-6)
    assert (a["mask"] != b["mask"]).mean() < 0.02


def test_inside_internal_matches_bruteforce():
    """The separable/corner-shortcut blackout mask equals the brute-force
    per-pixel affine check for crops straddling the frame edge."""
    rng = np.random.default_rng(3)
    res, W, H = 64, 640, 480
    hit_partial = hit_full = False
    from kd6d_pose_adlp_tpu.utils.geometry import dzi_affine
    cases = [(np.array([W / 2.0, H / 2.0]), 200.0, 0.0)]  # fully inside
    for _ in range(20):
        # random crop window, some fully inside, some poking out
        cases.append((rng.uniform([-100, -100], [W + 100, H + 100]),
                      float(rng.uniform(80, 900)),
                      float(rng.uniform(-30, 30))))
    for c, s, rot in cases:
        Mc = dzi_affine(c, s, res, rot_deg=rot)
        got = BOPPoseDataset._inside_internal(Mc, res, W, H)
        A, t = np.asarray(Mc[:, :2], np.float64), np.asarray(Mc[:, 2], np.float64)
        Ainv = np.linalg.inv(A)
        ys, xs = np.mgrid[0:res, 0:res].astype(np.float64)
        ix = Ainv[0, 0] * (xs - t[0]) + Ainv[0, 1] * (ys - t[1])
        iy = Ainv[1, 0] * (xs - t[0]) + Ainv[1, 1] * (ys - t[1])
        ref = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        if got is None:
            assert ref.all()
            hit_full = True
        else:
            np.testing.assert_array_equal(got, ref)
            hit_partial = hit_partial or not ref.all()
    assert hit_partial and hit_full  # both branches exercised


def test_fast_border_blackout(bop_root):  # noqa: F811
    """A crop window partly outside the internal frame must be black/
    background there in BOTH paths (the two-warp chain's second border)."""
    slow, fast = _pair(bop_root, train=False)
    # monkeypatch dzi scale upward by sampling a synthetic far-off-center
    # window: easiest faithful trigger is an eval sample whose object sits
    # near the border after the internal fit — emulate by warping manually
    from kd6d_pose_adlp_tpu.utils.geometry import dzi_affine
    from kd6d_pose_adlp_tpu.data import transforms as T

    s = slow.sample(0, seed=1)
    assert s is not None
    # re-crop both ways with a window hanging off the left edge
    Mc = dzi_affine(np.array([30.0, 240.0]), 400.0, 96)
    img = cv2.imread(str(bop_root / "train" / "000001" / "rgb" / "000000.png"))
    W, H = 640, 480
    M = T.internal_frame_matrix(img.shape[1], img.shape[0], W, H)
    frame = T.warp_image(img, M, (W, H), border=(128, 128, 128))
    two_step = T.warp_image(frame, Mc, (96, 96))
    Mfull = np.vstack([Mc, [0, 0, 1]]).astype(np.float64) @ np.asarray(M, np.float64)
    one_step = T.warp_image(img, Mfull, (96, 96), border=(128, 128, 128))
    inside = BOPPoseDataset._inside_internal(Mc, 96, W, H)
    assert inside is not None and not inside.all()
    one_step[~inside] = 0
    d = np.abs(two_step.astype(np.int32) - one_step.astype(np.int32))
    assert d.mean() < 4.0
    # the outside region is exactly black in both
    assert (two_step[~inside] == 0).all() and (one_step[~inside] == 0).all()
