"""Quantify PnP-induced pose error under vote noise (VERDICT r1 item 4).

Feeds GT-projected keypoint votes + Gaussian pixel noise through the
production solver (ransac_epnp, optionally + lhm_refine) and through
cv2.solvePnPRansac(EPNP, reprojErr 5.0) on IDENTICAL inputs, at LINEMOD-like
geometry (ape-scale corners, 0.6-1.1 m depth, internal 640x480 K —
reference postprocess/postprocess.py:190). Reports rotation (deg),
translation (mm) and ADD-proxy error percentiles per noise level.

Run: JAX_PLATFORM_NAME=cpu python scripts/pnp_noise_study.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scene(rng, n_scenes):
    """Random LINEMOD-like poses + ape-scale 3D box corners (meters)."""
    ext = rng.uniform(0.03, 0.06, (n_scenes, 3))  # half-extents ~ ape (d=0.104)
    corners = np.stack(np.meshgrid([-1, 1], [-1, 1], [-1, 1], indexing="ij"),
                       -1).reshape(8, 3).astype(np.float64)
    kp3d = corners[None] * ext[:, None, :]
    # random rotations via QR
    A = rng.normal(size=(n_scenes, 3, 3))
    Q, Rr = np.linalg.qr(A)
    Q *= np.sign(np.linalg.det(Q))[:, None, None]
    T = np.stack([rng.uniform(-0.15, 0.15, n_scenes),
                  rng.uniform(-0.10, 0.10, n_scenes),
                  rng.uniform(0.6, 1.1, n_scenes)], -1)
    return kp3d, Q, T


def project(kp3d, R, T, K):
    cam = kp3d @ R.T + T
    uv = cam @ K.T
    return uv[:, :2] / uv[:, 2:3]


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp

    from kd6d_pose_adlp_tpu.ops.epnp import lhm_refine, ransac_epnp, reprojection_errors

    K = np.array([[572.4114, 0, 325.2611],
                  [0, 573.57043, 242.04899],
                  [0, 0, 1]], np.float64)
    rng = np.random.default_rng(0)
    n_scenes, V = 50, 16  # V votes per keypoint (production max_votes=16..64)

    kp3d, Rs, Ts = make_scene(rng, n_scenes)

    @jax.jit
    def solve_ours(p3, p2, valid, key):
        return ransac_epnp(p3, p2, valid, jnp.asarray(K, jnp.float32), key,
                           iters=64, reproj_err=5.0)

    @jax.jit
    def refine_lhm(p3, p2, valid, R0, T0):
        Kf = jnp.asarray(K, jnp.float32)
        ones = jnp.ones((p2.shape[0], 1), jnp.float32)
        pix = jnp.concatenate([p2, ones], -1)
        rays = pix @ jnp.linalg.inv(Kf).T
        # weight = inlier mask of the initial pose
        err = reprojection_errors(p3, p2, Kf, R0, T0)
        w = ((err < 5.0) & valid).astype(jnp.float32)
        w = jnp.where(w.sum() >= 6, w, valid.astype(jnp.float32))
        return lhm_refine(p3, rays, w, R0, T0, iters=10)

    print(f"{'sigma':>6} {'solver':>14} {'rot_deg p50':>12} {'p90':>8} "
          f"{'T_mm p50':>10} {'p90':>8}")
    for sigma in (0.0, 0.5, 1.0, 2.0, 4.0):
        res = {"ours": [], "ours+lhm": [], "cv2": []}
        for s in range(n_scenes):
            gt2d = project(kp3d[s], Rs[s], Ts[s], K)            # (8,2)
            p3 = np.tile(kp3d[s], (V, 1)).astype(np.float32)    # (V*8,3)
            p2 = (np.tile(gt2d, (V, 1))
                  + rng.normal(0, max(sigma, 1e-9), (V * 8, 2))).astype(np.float32)
            valid = np.ones(V * 8, bool)

            R0, T0, _ = solve_ours(jnp.asarray(p3), jnp.asarray(p2),
                                   jnp.asarray(valid), jax.random.PRNGKey(s))
            R0n, T0n = np.asarray(R0, np.float64), np.asarray(T0, np.float64)
            res["ours"].append((rot_err_deg(R0n, Rs[s]),
                                np.linalg.norm(T0n - Ts[s]) * 1e3))

            R1, T1 = refine_lhm(jnp.asarray(p3), jnp.asarray(p2),
                                jnp.asarray(valid), R0, T0)
            R1n, T1n = np.asarray(R1, np.float64), np.asarray(T1, np.float64)
            res["ours+lhm"].append((rot_err_deg(R1n, Rs[s]),
                                    np.linalg.norm(T1n - Ts[s]) * 1e3))

            ok, rvec, tvec, _ = cv2.solvePnPRansac(
                p3.astype(np.float64), p2.astype(np.float64), K, None,
                flags=cv2.SOLVEPNP_EPNP, reprojectionError=5.0,
                iterationsCount=100)
            Rc = cv2.Rodrigues(rvec)[0]
            res["cv2"].append((rot_err_deg(Rc, Rs[s]),
                               np.linalg.norm(tvec[:, 0] - Ts[s]) * 1e3))

        for name, vals in res.items():
            r = np.array([v[0] for v in vals])
            t = np.array([v[1] for v in vals])
            print(f"{sigma:>6.1f} {name:>14} {np.percentile(r,50):>12.3f} "
                  f"{np.percentile(r,90):>8.3f} {np.percentile(t,50):>10.2f} "
                  f"{np.percentile(t,90):>8.2f}")


if __name__ == "__main__":
    main()
