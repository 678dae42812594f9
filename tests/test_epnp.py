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


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_epnp_near_planar_with_lhm_polish(seed):
    """Near-planar point sets (z-extent 0.1% of xy) drive the control-point
    basis toward singular; the relative eigenvalue floor in _control_points
    (ops/epnp.py) keeps the barycentric solve conditioned, and the
    production contract (EPnP seed + LHM refinement, as in
    engine/postprocess) must still recover the pose tightly."""
    from kd6d_pose_adlp_tpu.ops.smallalg import inv3

    rng = np.random.default_rng(seed)
    R = geo.quaternion2rotation(rng.normal(size=4)).astype(np.float32)
    T = np.array([rng.uniform(-60, 60), rng.uniform(-40, 40),
                  rng.uniform(700, 1000)], np.float32)
    pts3d = rng.uniform(-60, 60, size=(20, 3)).astype(np.float32)
    pts3d[:, 2] = rng.normal(scale=0.06, size=20).astype(np.float32)  # ~planar
    pts2d = geo.project_points(K, R, T, pts3d).astype(np.float32)
    w = jnp.ones(20, jnp.float32)

    Rh, Th = ep.epnp(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K), w)
    rot0, t0 = _pose_err(R, T, np.asarray(Rh), np.asarray(Th))
    assert np.isfinite(rot0) and rot0 < 15.0, rot0  # seed quality only

    pix = jnp.concatenate([jnp.asarray(pts2d),
                           jnp.ones((20, 1), jnp.float32)], -1)
    rays = pix @ inv3(jnp.asarray(K)).T
    Rr, Tr = ep.lhm_refine(jnp.asarray(pts3d), rays, w, Rh, Th, iters=10)
    rot1, t1 = _pose_err(R, T, np.asarray(Rr), np.asarray(Tr))
    assert rot1 < 0.5, (rot0, rot1)
    assert t1 < 5.0, (t0, t1)


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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_ransac_epnp_vs_cv2_under_noise():
    """On-device RANSAC-EPnP(+LHM) must stay within tolerance of
    cv2.solvePnPRansac(EPNP, 5.0) on identical noisy votes at LINEMOD-like
    geometry (VERDICT r1 item 4; full sweep in scripts/pnp_noise_study.py,
    which shows ours <= cv2 on both rotation and translation medians)."""
    import cv2

    from kd6d_pose_adlp_tpu.ops.epnp import (lhm_refine, ransac_epnp,
                                             reprojection_errors)

    K = np.array([[572.4114, 0, 325.2611],
                  [0, 573.57043, 242.04899],
                  [0, 0, 1]], np.float64)
    Kf = jnp.asarray(K, jnp.float32)
    Kinv = jnp.linalg.inv(Kf)
    rng = np.random.default_rng(3)
    corners = np.stack(np.meshgrid([-1, 1], [-1, 1], [-1, 1], indexing="ij"),
                       -1).reshape(8, 3).astype(np.float64)

    def rot_err_deg(Ra, Rb):
        c = (np.trace(Ra.T @ Rb) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    @jax.jit
    def solve(p3, p2, valid, key):
        R0, T0, _ = ransac_epnp(p3, p2, valid, Kf, key, iters=64,
                                reproj_err=5.0)
        pix = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1), jnp.float32)], -1)
        rays = pix @ Kinv.T
        err = reprojection_errors(p3, p2, Kf, R0, T0)
        w = ((err < 5.0) & valid).astype(jnp.float32)
        w = jnp.where(w.sum() >= 6, w, valid.astype(jnp.float32))
        return lhm_refine(p3, rays, w, R0, T0, iters=10)

    sigma, V = 2.0, 16
    ours_r, ours_t, cv_r, cv_t = [], [], [], []
    for s in range(10):
        kp3d = corners * rng.uniform(0.03, 0.06, (1, 3))
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        Q *= np.sign(np.linalg.det(Q))
        T = np.array([rng.uniform(-0.15, 0.15), rng.uniform(-0.1, 0.1),
                      rng.uniform(0.6, 1.1)])
        cam = kp3d @ Q.T + T
        uv = cam @ K.T
        gt2d = uv[:, :2] / uv[:, 2:3]
        p3 = np.tile(kp3d, (V, 1)).astype(np.float32)
        p2 = (np.tile(gt2d, (V, 1))
              + rng.normal(0, sigma, (V * 8, 2))).astype(np.float32)
        valid = np.ones(V * 8, bool)

        R1, T1 = solve(jnp.asarray(p3), jnp.asarray(p2), jnp.asarray(valid),
                       jax.random.PRNGKey(s))
        ours_r.append(rot_err_deg(np.asarray(R1, np.float64), Q))
        ours_t.append(np.linalg.norm(np.asarray(T1, np.float64) - T))

        okc, rvec, tvec, _ = cv2.solvePnPRansac(
            p3.astype(np.float64), p2.astype(np.float64), K, None,
            flags=cv2.SOLVEPNP_EPNP, reprojectionError=5.0,
            iterationsCount=100)
        Rc = cv2.Rodrigues(rvec)[0]
        cv_r.append(rot_err_deg(Rc, Q))
        cv_t.append(np.linalg.norm(tvec[:, 0] - T))

    # medians within 1.5x of cv2 plus a small absolute floor, and sane bounds
    assert np.median(ours_r) <= 1.5 * np.median(cv_r) + 0.1, (ours_r, cv_r)
    assert np.median(ours_t) <= 1.5 * np.median(cv_t) + 1e-3, (ours_t, cv_t)
    assert np.median(ours_r) < 1.5 and np.median(ours_t) < 0.02
