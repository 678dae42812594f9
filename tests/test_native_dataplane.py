"""Native C++ data-plane vs cv2/NumPy references."""
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.data import native
from kd6d_pose_adlp_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, normalize


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def test_warp_u8_matches_cv2(lib):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    M = np.array([[0.8, 0.1, 5.0], [-0.05, 0.9, 8.0]], np.float64)
    ours = native.warp_affine_u8(img, M, (100, 140), border=(128, 128, 128))
    ref = cv2.warpAffine(img, M, (140, 100), flags=cv2.INTER_LINEAR,
                         borderValue=(128, 128, 128))
    # identical bilinear math; allow 1 LSB rounding and border-edge blending
    inner = (slice(2, -2), slice(2, -2))
    diff = np.abs(ours[inner].astype(int) - ref[inner].astype(int))
    assert np.quantile(diff, 0.999) <= 1.0, diff.max()


def test_warp_i32_matches_exact_nearest(lib):
    """Our nearest warp implements true round-to-nearest inverse mapping;
    verify against an exact NumPy reference. (cv2's INTER_NEAREST uses
    fixed-point coordinates with its own boundary convention — only edge
    pixels differ, checked loosely.)"""
    rng = np.random.default_rng(1)
    mask = rng.integers(-1, 4, (120, 160)).astype(np.int32)
    M = np.array([[1.2, 0.0, -10.0], [0.0, 1.2, -4.0]], np.float64)
    ours = native.warp_affine_i32(mask, M, (100, 140), border=0)

    A = np.vstack([M, [0, 0, 1]])
    Minv = np.linalg.inv(A)
    ys, xs = np.mgrid[0:100, 0:140]
    sx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    sy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    # half-up rounding to match lround (np.round is banker's half-even; the
    # two differ exactly on .5 ties, which are dense for rational scales)
    ix, iy = np.floor(sx + 0.5).astype(int), np.floor(sy + 0.5).astype(int)
    ref = np.zeros((100, 140), np.int32)
    ok = (ix >= 0) & (iy >= 0) & (ix < 160) & (iy < 120)
    ref[ok] = mask[iy[ok], ix[ok]]
    agree = (ours == ref).mean()
    assert agree > 0.999, agree

    cv2 = pytest.importorskip("cv2")
    ref_cv = cv2.warpAffine(mask.astype(np.float32), M, (140, 100),
                            flags=cv2.INTER_NEAREST, borderValue=0).astype(np.int32)
    assert (ours == ref_cv).mean() > 0.85


def test_normalize_matches_numpy(lib):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    ours = native.normalize_bgr_u8(img, IMAGENET_MEAN, IMAGENET_STD)
    ref = normalize(img)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
