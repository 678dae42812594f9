import numpy as np
import pytest

from kd6d_pose_adlp_tpu.utils import geometry as geo


def random_rotation(rng):
    q = rng.normal(size=4)
    return geo.quaternion2rotation(q)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        R = random_rotation(rng)
        q = geo.rotation2quaternion(R)
        R2 = geo.quaternion2rotation(q)
        np.testing.assert_allclose(R, R2, atol=1e-9)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0


@pytest.mark.parametrize("axes", ["sxyz", "syzx", "szyx"])
def test_euler_roundtrip(axes):
    rng = np.random.default_rng(1)
    for _ in range(30):
        R = random_rotation(rng)
        ai, aj, ak = geo.mat2euler(R, axes)
        R2 = geo.euler2mat(ai, aj, ak, axes)
        np.testing.assert_allclose(R, R2, atol=1e-8)


def test_euler_identity():
    np.testing.assert_allclose(geo.euler2mat(0, 0, 0, "sxyz"), np.eye(3), atol=1e-12)
    # single-axis rotations land in the expected place
    Rz = geo.euler2mat(0, 0, np.pi / 2, "sxyz")
    np.testing.assert_allclose(Rz @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-12)


def test_symmetry_handling_mod180_idempotent_and_invariant():
    # A 180deg rotation about Z must map to the same canonical pose as identity
    spec = ("Z", 180)
    R1 = np.eye(3)
    R2 = geo.euler2mat(np.pi, 0, 0, "szyx")  # rotate pi about z (first axis of szyx)
    c1 = geo.pose_symmetry_handling(R1, spec)
    c2 = geo.pose_symmetry_handling(R2, spec)
    np.testing.assert_allclose(c1, c2, atol=1e-5)
    # idempotent
    np.testing.assert_allclose(geo.pose_symmetry_handling(c2, spec), c2, atol=1e-5)


def test_project_points_simple():
    K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    R = np.eye(3)
    T = np.array([0.0, 0, 10.0])
    pts = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 2.0, 0]])
    uv = geo.project_points(K, R, T, pts)
    np.testing.assert_allclose(uv[0], [64, 64], atol=1e-5)
    np.testing.assert_allclose(uv[1], [74, 64], atol=1e-5)
    np.testing.assert_allclose(uv[2], [64, 84], atol=1e-5)


def test_affine_inverse():
    rng = np.random.default_rng(2)
    M = rng.normal(size=(2, 3))
    M[:2, :2] += np.eye(2) * 2
    Minv = geo.invert_affine_2x3(M)
    pts = rng.normal(size=(5, 2))
    back = geo.apply_affine(Minv, geo.apply_affine(M, pts))
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_rotation_matrix_2d_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    M1 = geo.rotation_matrix_2d((32.0, 17.0), 33.0, 1.2)
    M2 = cv2.getRotationMatrix2D((32.0, 17.0), 33.0, 1.2)
    np.testing.assert_allclose(M1, M2, atol=1e-9)


def test_dzi_affine_matches_reference_construction():
    """Our closed-form dzi_affine must equal the reference's 3-point
    getAffineTransform construction (libs/dzi_libs.py:157-198)."""
    cv2 = pytest.importorskip("cv2")

    def ref_affine(center, scale, rot, output_size):
        # re-derivation of the reference construction for testing
        def get_dir(src_point, rot_rad):
            sn, cs = np.sin(rot_rad), np.cos(rot_rad)
            return [src_point[0] * cs - src_point[1] * sn,
                    src_point[0] * sn + src_point[1] * cs]

        def get_3rd_point(a, b):
            direct = a - b
            return b + np.array([-direct[1], direct[0]], dtype=np.float32)

        scale = np.array([scale, scale], dtype=np.float32)
        src_w, dst_w, dst_h = scale[0], output_size, output_size
        rot_rad = np.pi * rot / 180
        src_dir = get_dir([0, src_w * -0.5], rot_rad)
        dst_dir = np.array([0, dst_w * -0.5], np.float32)
        src = np.zeros((3, 2), dtype=np.float32)
        dst = np.zeros((3, 2), dtype=np.float32)
        src[0, :] = center
        src[1, :] = center + src_dir
        dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
        dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5], np.float32) + dst_dir
        src[2:, :] = get_3rd_point(src[0, :], src[1, :])
        dst[2:, :] = get_3rd_point(dst[0, :], dst[1, :])
        return cv2.getAffineTransform(np.float32(src), np.float32(dst))

    for center, scale, rot in [((100.0, 80.0), 192.0, 0.0), ((321.5, 240.25), 300.0, 0.0),
                               ((50.0, 60.0), 128.0, 15.0)]:
        ours = geo.dzi_affine(np.array(center), scale, 256, rot)
        ref = ref_affine(np.array(center), scale, rot, 256)
        np.testing.assert_allclose(ours, ref, atol=1e-4)
