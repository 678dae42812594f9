"""Scan-eval parity: the one-dispatch evaluator must reproduce the
streaming evaluator's predictions and metric tables, and the device
pose-diff scorer must match the host NumPy oracle.

engine/eval_scan runs the whole eval set (forward -> vote -> RANSAC-EPnP ->
K-remap) inside one lax.map program and scores ADD/ADI/REP on device
(VERDICT r4 #2); engine/evaluator.valid + utils.metrics stay the oracles.
Reference semantics: libs/eval_libs.py:45-149, libs/evaluate.py:24-195,
libs/utils.py:504-526,715-765.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.engine import evaluator
from kd6d_pose_adlp_tpu.engine.eval_scan import (
    ScanEvaluator, build_pose_diff_scorer, evaluate_pose_predictions_device)
from kd6d_pose_adlp_tpu.engine.postprocess import build_postprocess
from kd6d_pose_adlp_tpu.utils import metrics as M

from test_train_e2e import (N_FG, _fabricated_outputs, _tiny_consts,
                            small_cfg, small_data)


def _eval_batches(ds, n=12, bs=4):
    batches = []
    for start in range(0, n, bs):
        idx = list(range(start, start + bs))
        batch = ds.batch(idx, train=False)
        metas = []
        for i in idx:
            s = ds.sample(i, train=False)
            metas.append(dict(filename=f"img_{i}.png", K=s["meta"]["K"],
                              width=s["meta"]["width"],
                              height=s["meta"]["height"],
                              class_ids=[s["meta"]["cls"]],
                              rotations=[s["meta"]["R"]],
                              translations=[s["meta"]["T"]]))
        batches.append((batch, metas))
    return batches


def _random_poses(rng, n):
    from kd6d_pose_adlp_tpu.utils.geometry import euler2mat
    Rs = np.stack([euler2mat(*rng.uniform(-3, 3, 3)) for _ in range(n)])
    Ts = rng.uniform([-50, -50, 400], [50, 50, 900], (n, 3))
    return Rs.astype(np.float64), Ts.astype(np.float64)


def test_device_scorer_matches_host_oracle():
    """build_pose_diff_scorer == compute_pose_diff_batch (incl. symmetric
    closest-point and unequal mesh sizes)."""
    rng = np.random.default_rng(0)
    meshes = [rng.uniform(-40, 40, (m, 3)) for m in (8, 30, 17)]
    sym_ids = [1]
    scorer = build_pose_diff_scorer(meshes, sym_ids, chunk=4)
    n = 11
    cls = rng.integers(0, 3, n).astype(np.int32)
    K = np.tile(np.array([[572.4, 0, 325.2], [0, 573.5, 242.0], [0, 0, 1.0]]),
                (n, 1, 1))
    gtR, gtT = _random_poses(rng, n)
    dR, _ = _random_poses(rng, n)
    pR = np.matmul(gtR, np.eye(3) + 0.02 * (dR - np.eye(3)))
    pT = gtT + rng.normal(0, 2.0, (n, 3))
    e3d, e2d = scorer(jnp.asarray(cls), jnp.asarray(K, jnp.float32),
                      jnp.asarray(gtR, jnp.float32), jnp.asarray(gtT, jnp.float32),
                      jnp.asarray(pR, jnp.float32), jnp.asarray(pT, jnp.float32))
    e3d, e2d = np.asarray(e3d), np.asarray(e2d)
    for c in range(3):
        sel = cls == c
        if not sel.any():
            continue
        h3, h2 = M.compute_pose_diff_batch(
            meshes[c], K[sel], gtR[sel], gtT[sel], pR[sel], pT[sel],
            is_sym=c in sym_ids)
        np.testing.assert_allclose(e3d[sel], h3, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(e2d[sel], h2, rtol=2e-4, atol=1e-3)


def test_evaluate_predictions_device_matches_host():
    """evaluate_pose_predictions_device reproduces the host function's full
    result structure (hits, misses, depth bins, AUC) on a synthetic preds
    dict with misses and a symmetric class."""
    rng = np.random.default_rng(1)
    n_fg = 3
    meshes = [rng.uniform(-40, 40, (20, 3)) for _ in range(n_fg)]
    diam = [float(np.linalg.norm(m.max(0) - m.min(0))) for m in meshes]
    sym = {1: ("Z", 180)}
    K = np.array([[572.4, 0, 325.2], [0, 573.5, 242.0], [0, 0, 1.0]])
    preds = {}
    gtR, gtT = _random_poses(rng, 30)
    pR, pT = gtR.copy(), gtT + rng.normal(0, 1.5, (30, 3))
    for i in range(30):
        c = int(i % n_fg)
        pred = []
        if i % 5 != 4:  # every 5th is a miss -> penalty path
            pred = [[0.9, c, pR[i].tolist(), pT[i].reshape(3, 1).tolist(), []]]
        preds[f"img_{i}.png"] = {
            "meta": {"K": K.tolist(), "width": 640, "height": 480,
                     "class_ids": [c], "rotations": [gtR[i].tolist()],
                     "translations": [gtT[i].tolist()]},
            "pred": pred}
    host = M.evaluate_pose_predictions(preds, n_fg + 1, meshes, diam, sym)
    dev = evaluate_pose_predictions_device(preds, n_fg + 1, meshes, diam, sym)
    assert M.format_accuracy_table(host) == M.format_accuracy_table(dev)
    np.testing.assert_allclose(host["depth_range"], dev["depth_range"])
    for g in ("adi_per_depth", "rep_per_depth"):
        for hb, db in zip(host[g], dev[g]):
            assert set(hb) == set(db)
            for k in hb:
                np.testing.assert_allclose(hb[k], db[k], atol=1e-9, err_msg=(g, k))


@pytest.mark.slow
def test_scan_eval_matches_streaming_valid():
    """Full-path parity: ScanEvaluator.run == evaluator.valid on the same
    fabricated predictions — same per-image poses (tolerance: lax.map may
    fuse differently than the per-batch jit), identical metric tables."""
    cfg = small_cfg()
    ds = small_data()
    consts = _tiny_consts(ds)
    cfg_eval = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, n_class=N_FG + 1,
        mesh_diameters=tuple(np.asarray(consts.diameters))))
    meshes = [np.asarray(consts.kp3d[c]) for c in range(N_FG)]
    batches = _eval_batches(ds)

    outs = [_fabricated_outputs(b, consts, cfg) for b, _ in batches]
    it = iter(outs)

    def stream_forward(variables, images):
        return next(it)

    postprocess = build_postprocess(cfg_eval, consts)
    r_stream = evaluator.valid(cfg_eval, consts, None, stream_forward,
                               postprocess, iter(batches), meshes,
                               verbose=False)

    # scan path: inject the same fabricated outputs, indexed by chunk
    logits_all = jnp.stack([o[0] for o in outs])
    regs_all = jnp.stack([o[1] for o in outs])

    def scan_forward(variables, images, idx):
        return logits_all[idx], regs_all[idx]

    sev = ScanEvaluator(cfg_eval, consts, net=None, meshes=meshes,
                        forward=scan_forward)
    sev.prepare(iter(batches))
    r_scan = sev.run(None, verbose=False)

    assert set(r_scan["predictions"]) == set(r_stream["predictions"])
    for fn, s_item in r_stream["predictions"].items():
        d_item = r_scan["predictions"][fn]
        assert d_item["meta"] == s_item["meta"]
        assert len(d_item["pred"]) == len(s_item["pred"]), fn
        for sp, dp in zip(s_item["pred"], d_item["pred"]):
            assert sp[1] == dp[1]
            np.testing.assert_allclose(dp[0], sp[0], rtol=1e-5)
            np.testing.assert_allclose(dp[2], sp[2], rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(dp[3], sp[3], rtol=1e-4, atol=1e-3)
    assert r_scan["table"] == r_stream["table"]
    # not a vacuous pass
    adi = r_stream["adi_per_class"][1].get("ADI.10d")
    assert adi is not None and adi > 0.0, r_stream["table"]


@pytest.mark.slow
def test_scan_eval_remap_path():
    """Images whose native K differs from the internal K must go through the
    on-device EPnP refit and land near the host cv2/EPnP remap result."""
    cfg = small_cfg()
    ds = small_data()
    consts = _tiny_consts(ds)
    cfg_eval = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, n_class=N_FG + 1,
        mesh_diameters=tuple(np.asarray(consts.diameters))))
    meshes = [np.asarray(consts.kp3d[c]) for c in range(N_FG)]
    batches = _eval_batches(ds, n=8)
    # fake a different native K on every image (scaled focal, shifted center)
    K2 = np.asarray(consts.K, np.float64).copy()
    K2[0, 0] *= 1.07
    K2[1, 1] *= 0.93
    K2[0, 2] += 11.0
    for _, metas in batches:
        for m in metas:
            m["K"] = K2
    outs = [_fabricated_outputs(b, consts, cfg) for b, _ in batches]
    it = iter(outs)
    postprocess = build_postprocess(cfg_eval, consts)
    r_stream = evaluator.valid(cfg_eval, consts, None,
                               lambda v, im: next(it), postprocess,
                               iter(batches), meshes, verbose=False)
    logits_all = jnp.stack([o[0] for o in outs])
    regs_all = jnp.stack([o[1] for o in outs])
    sev = ScanEvaluator(cfg_eval, consts, net=None, meshes=meshes,
                        forward=lambda v, im, i: (logits_all[i], regs_all[i]))
    sev.prepare(iter(batches))
    r_scan = sev.run(None, verbose=False)
    n_checked = 0
    for fn, s_item in r_stream["predictions"].items():
        d_item = r_scan["predictions"][fn]
        for sp, dp in zip(s_item["pred"], d_item["pred"]):
            np.testing.assert_allclose(dp[2], sp[2], atol=5e-3)
            np.testing.assert_allclose(dp[3], sp[3], rtol=2e-3, atol=0.5)
            n_checked += 1
    assert n_checked > 0
    assert r_scan["table"] == r_stream["table"]
