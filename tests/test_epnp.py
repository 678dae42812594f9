import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.ops import epnp as ep
from kd6d_pose_adlp_tpu.utils import geometry as geo

K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1]], np.float32)


def _scene(rng, n=24, noise=0.0):
    R = geo.quaternion2rotation(rng.normal(size=4)).astype(np.float32)
    T = np.array([rng.uniform(-80, 80), rng.uniform(-60, 60), rng.uniform(600, 1100)],
                 np.float32)
    pts3d = rng.uniform(-60, 60, size=(n, 3)).astype(np.float32)
    pts2d = geo.project_points(K, R, T, pts3d).astype(np.float32)
    pts2d += rng.normal(scale=noise, size=pts2d.shape).astype(np.float32)
    return R, T, pts3d, pts2d


def _pose_err(R1, T1, R2, T2):
    rot = np.degrees(np.arccos(np.clip((np.trace(R1.T @ R2) - 1) / 2, -1, 1)))
    return rot, np.linalg.norm(T1 - np.asarray(T2).reshape(-1))


def test_umeyama_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    R = geo.quaternion2rotation(rng.normal(size=4)).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32) * 10
    X = rng.normal(size=(10, 3)).astype(np.float32)
    Y = X @ R.T + t
    w = np.ones(10, np.float32)
    R2, t2 = ep.umeyama(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_epnp_exact_correspondences(seed):
    rng = np.random.default_rng(seed)
    R, T, pts3d, pts2d = _scene(rng, n=16, noise=0.0)
    w = np.ones(16, np.float32)
    Rh, Th = ep.epnp(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K), jnp.asarray(w))
    rot_err, t_err = _pose_err(R, T, np.asarray(Rh), np.asarray(Th))
    assert rot_err < 0.5, rot_err
    assert t_err < 5.0, t_err


def test_epnp_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    R, T, pts3d, pts2d = _scene(rng, n=16, noise=1.0)
    w = np.ones(16, np.float32)
    Rh, Th = ep.epnp(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K), jnp.asarray(w))
    ok, rvec, tvec = cv2.solvePnP(pts3d.reshape(-1, 1, 3), pts2d.reshape(-1, 1, 2),
                                  K, None, flags=cv2.SOLVEPNP_EPNP)
    assert ok
    Rcv = cv2.Rodrigues(rvec)[0]
    rot_err, t_err = _pose_err(Rcv, tvec.reshape(-1), np.asarray(Rh), np.asarray(Th))
    # both solve the same noisy problem; they should agree closely
    assert rot_err < 2.0, rot_err
    assert t_err < 15.0, t_err


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(11)
    R, T, pts3d, pts2d = _scene(rng, n=40, noise=0.5)
    # corrupt 30% of the correspondences badly
    n_out = 12
    out_idx = rng.choice(40, n_out, replace=False)
    pts2d = pts2d.copy()
    pts2d[out_idx] += rng.uniform(40, 120, size=(n_out, 2)).astype(np.float32)
    valid = np.ones(40, bool)
    Rh, Th, n_in = ep.ransac_epnp(
        jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(valid), jnp.asarray(K),
        jax.random.PRNGKey(0), iters=64, reproj_err=5.0)
    rot_err, t_err = _pose_err(R, T, np.asarray(Rh), np.asarray(Th))
    assert int(n_in) >= 20
    assert rot_err < 2.0, rot_err
    assert t_err < 15.0, t_err


def test_ransac_respects_validity_mask():
    rng = np.random.default_rng(13)
    R, T, pts3d, pts2d = _scene(rng, n=32, noise=0.3)
    # invalid slots carry garbage; solver must ignore them
    pts2d = pts2d.copy()
    pts2d[20:] = rng.uniform(-1000, 1000, size=(12, 2)).astype(np.float32)
    valid = np.arange(32) < 20
    Rh, Th, _ = ep.ransac_epnp(
        jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(valid), jnp.asarray(K),
        jax.random.PRNGKey(1), iters=64)
    rot_err, t_err = _pose_err(R, T, np.asarray(Rh), np.asarray(Th))
    assert rot_err < 2.0
    assert t_err < 15.0
