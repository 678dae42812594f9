"""One-dispatch evaluation: the whole eval set as a single compiled program.

Round-4 measurement: the streaming evaluator (engine/evaluator.valid) tops
out at ~52-64 img/s end-to-end on the tunnel-attached TPU while the device
postprocess op alone runs ~1,530 img/s and inference ~25k — the wall is
per-batch traffic (image upload + dispatch RTT + device_get), not host CPU
(the per-image Python in `consume` measures 0.21 ms and the metric pass
0.04 ms on this host). Same diagnosis as the round-3 training loop, same
cure as its pool-scan: upload the WHOLE eval set once, run
forward -> vote -> RANSAC-EPnP -> pose-remap for every batch inside one
`lax.map`, and fetch one compact pytree of per-image results.

The device program also absorbs the two host stages the reference runs per
image (and VERDICT r4 #2 names):
  * pose remap to each image's native K — the reference re-fits via
    `cv2.solvePnP` per prediction (`libs/evaluate.py:174-195`,
    `libs/utils.py:504-526`); here a vmapped in-repo EPnP refit over all
    images, selected by a per-image mask (K == internal K skips it, like
    the host path).
  * ADD/ADI/REP scoring — the reference scores per prediction over a
    1000-vertex mesh subsample on CPU (`libs/utils.py:715-745`); here one
    batched device program over every (gt, pred) pair of the eval set
    (closest-point matching for symmetric classes via chunked matmul
    argmin), aggregation (thresholds, AUC, depth bins, miss penalties)
    stays host NumPy on (N,) arrays.

The streaming `evaluator.valid` remains the oracle: predictions and metric
tables are pinned equal by tests/test_eval_scan.py. Multi-host eval works
unchanged — each process scans its shard, prediction dicts merge via
`gather_host_objects` before scoring.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.batch import TaskConsts
from ..utils import geometry as geo
from ..utils import metrics as M
from ..utils.logging_utils import ScalarLogger
from .postprocess import _make_class_solver

_HP = jax.lax.Precision.HIGHEST


def build_eval_scan(cfg: Config, consts: TaskConsts, net=None,
                    forward: Optional[Callable] = None):
    """Compile run(variables, images, bbox_trans, class_ids, K_img,
    remap_mask, keys) -> dict of flat (N, ...) prediction arrays.

    Inputs are chunked (Nc, B, ...); `keys` is (Nc, 2) — one PRNG key per
    chunk, split per image inside exactly like build_postprocess, so the
    RANSAC draws match the streaming path batch for batch. `forward`
    overrides the network apply (tests inject fabricated outputs); its
    signature is (variables, images, chunk_idx) -> (cls_logits, pred_reg).
    """
    solver = _make_class_solver(cfg, consts)
    if forward is None:
        def forward(variables, images, idx):  # noqa: ARG001 (idx for tests)
            return net.apply(variables, images, train=False)

    @jax.jit
    def run(variables, images, bbox_trans, class_ids, K_img, remap_mask, keys):
        def one(args):
            idx, imgs, bt, cid, key = args
            cls_logits, pred_reg = forward(variables, imgs, idx)
            gt_cls = jnp.clip(cid[:, 0], 0)
            out = solver(gt_cls, cls_logits, pred_reg, bt, key)
            out["valid"] = out["valid"] & (cid[:, 0] >= 0)
            return out

        n_chunks = images.shape[0]
        outs = jax.lax.map(one, (jnp.arange(n_chunks), images, bbox_trans,
                                 class_ids, keys))
        outs = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), outs)

        # pose remap to the native per-image K (reference remap_predictions,
        # libs/evaluate.py:174-195): reproject the 8 corners under the new K
        # and re-solve PnP. Identical math to evaluator.remap_pose_host
        # (dst_K @ inv(src_K) @ src_K == dst_K), EPnP instead of cv2.
        from ..ops.epnp import epnp
        corners = consts.kp3d[outs["cls"]]                     # (N, 8, 3)

        def refit(R, T, corn, Kd):
            cam = jnp.matmul(corn, R.T, precision=_HP) + T.reshape(3)
            uv = jnp.matmul(cam, Kd.T, precision=_HP)
            xy = uv[:, :2] / (uv[:, 2:3] + 1e-8)
            return epnp(corn, xy, Kd, jnp.ones((8,), jnp.float32))

        R2, T2 = jax.vmap(refit)(outs["R"], outs["T"], corners, K_img)
        outs["R"] = jnp.where(remap_mask[:, None, None], R2, outs["R"])
        outs["T"] = jnp.where(remap_mask[:, None], T2.reshape(-1, 3),
                              outs["T"].reshape(-1, 3))
        return outs

    return run


def build_pose_diff_scorer(meshes: Sequence[np.ndarray],
                           sym_class_ids: Sequence[int],
                           max_pts: int = 1000, chunk: int = 16):
    """Device ADD/ADI + 2D-reprojection errors over flat prediction arrays.

    Same per-pair math as utils.metrics.compute_pose_diff_batch (reference
    libs/utils.py:715-745): identical mesh subsample (seeded rng(0) choice),
    closest-point matching for symmetric classes via a chunked
    squared-distance matmul argmin. Tie-break on exactly equidistant mesh
    points follows the d2-argmin convention (can differ from cKDTree on
    degenerate meshes; err_3d is unaffected).

    Returns score(cls, K, gtR, gtT, pR, pT) -> (err3d (N,), err2d (N,)),
    all inputs (N, ...) float32/int32; N is padded to a multiple of `chunk`
    internally.
    """
    C = len(meshes)
    subs = [M._subsample_mesh(m, max_pts) for m in meshes]
    P = max(len(s) for s in subs)
    table = np.zeros((C, P, 3), np.float32)
    nvalid = np.zeros((C,), np.int32)
    for c, s in enumerate(subs):
        table[c, :len(s)] = s
        nvalid[c] = len(s)
    is_sym_c = np.zeros((C,), bool)
    for c in sym_class_ids:
        if 0 <= c < C:
            is_sym_c[c] = True
    tbl = jnp.asarray(table)
    nv = jnp.asarray(nvalid)
    sym_v = jnp.asarray(is_sym_c)

    @jax.jit
    def score(cls, K, gtR, gtT, pR, pT):
        N = cls.shape[0]
        pad = (-N) % chunk
        if pad:
            cls = jnp.concatenate([cls, jnp.zeros((pad,), cls.dtype)])
            K = jnp.concatenate([K, jnp.tile(jnp.eye(3, dtype=K.dtype), (pad, 1, 1))])
            gtR = jnp.concatenate([gtR, jnp.tile(jnp.eye(3, dtype=gtR.dtype), (pad, 1, 1))])
            pR = jnp.concatenate([pR, jnp.tile(jnp.eye(3, dtype=pR.dtype), (pad, 1, 1))])
            gtT = jnp.concatenate([gtT, jnp.ones((pad, 3), gtT.dtype)])
            pT = jnp.concatenate([pT, jnp.ones((pad, 3), pT.dtype)])
        pts = tbl[cls]                                         # (Np, P, 3)
        vmask = (jnp.arange(P)[None, :] < nv[cls][:, None])    # (Np, P)
        inv_n = 1.0 / nv[cls].astype(jnp.float32)
        p1 = jnp.matmul(pts, jnp.swapaxes(gtR, 1, 2), precision=_HP) \
            + gtT[:, None, :]
        p2 = jnp.matmul(pts, jnp.swapaxes(pR, 1, 2), precision=_HP) \
            + pT[:, None, :]

        def match(args):
            a, b, v = args                                     # (c,P,3) x2, (c,P)
            d2 = (b * b).sum(-1)[:, None, :] - 2.0 * jnp.matmul(
                a, jnp.swapaxes(b, 1, 2), precision=_HP)
            d2 = jnp.where(v[:, None, :], d2, jnp.inf)
            idx = jnp.argmin(d2, axis=-1)                      # (c,P)
            return jnp.take_along_axis(b, idx[..., None], axis=1)

        Np = p1.shape[0]
        resh = lambda x: x.reshape((Np // chunk, chunk) + x.shape[1:])
        matched = jax.lax.map(match, (resh(p1), resh(p2), resh(vmask)))
        matched = matched.reshape(p2.shape)
        p2m = jnp.where(sym_v[cls][:, None, None], matched, p2)

        def proj(p):
            q = jnp.matmul(p, jnp.swapaxes(K, 1, 2), precision=_HP)
            return q[..., :2] / (q[..., 2:] + 1e-8)

        w = vmask.astype(jnp.float32)
        e3 = (w * jnp.linalg.norm(p1 - p2m, axis=2)).sum(1) * inv_n
        e2 = (w * jnp.linalg.norm(proj(p1) - proj(p2m), axis=2)).sum(1) * inv_n
        return e3[:N], e2[:N]

    return score


def evaluate_pose_predictions_device(predictions: Dict, class_number: int,
                                     meshes: Sequence[np.ndarray],
                                     mesh_diameters: Sequence[float],
                                     symmetry_types: Dict[int, Sequence],
                                     scorer=None) -> Dict:
    """Drop-in for utils.metrics.evaluate_pose_predictions with the per-pair
    ADD/ADI/REP errors computed in ONE device call over all classes (the
    host version runs one BLAS pass per class plus a per-image cKDTree loop
    for symmetric classes). Aggregation — thresholds, AUC, depth bins, miss
    penalties (reference libs/evaluate.py:24-172) — is identical host code.
    """
    class_num = class_number - 1
    depth_bins = 3
    if scorer is None:
        scorer = build_pose_diff_scorer(meshes, list(symmetry_types.keys()))

    depth_min, depth_max = M.INF, 0.0
    for item in predictions.values():
        for T in np.asarray(item["meta"]["translations"]).reshape(-1, 3):
            depth_min = min(depth_min, float(T[2]))
            depth_max = max(depth_max, float(T[2]))
    depth_max += 1e-5
    bin_w = (depth_max - depth_min) / depth_bins

    # pass 1: flatten every (gt, best-pred) hit across ALL classes; record
    # misses (penalty errors) immediately
    flat = {k: [] for k in ("cls", "K", "gtR", "gtT", "pR", "pT", "bin")}
    miss_adi = [[] for _ in range(class_num)]    # per class penalty errors
    miss_bin: List = []
    for item in predictions.values():
        meta = item["meta"]
        gt_ids = list(meta["class_ids"])
        for clsid in range(class_num):
            if clsid not in gt_ids:
                continue
            gi = gt_ids.index(clsid)
            gtT = np.asarray(meta["translations"]).reshape(-1, 3)[gi]
            depth_idx = int((float(gtT[2]) - depth_min) / bin_w)
            pred = [p for p in item["pred"] if int(p[1]) == clsid]
            if pred:
                flat["cls"].append(clsid)
                flat["K"].append(np.asarray(meta["K"], np.float32).reshape(3, 3))
                flat["gtR"].append(np.asarray(meta["rotations"],
                                              np.float32).reshape(-1, 3, 3)[gi])
                flat["gtT"].append(gtT.astype(np.float32))
                flat["pR"].append(np.asarray(pred[0][2], np.float32))
                flat["pT"].append(np.asarray(pred[0][3], np.float32).reshape(3))
                flat["bin"].append(depth_idx)
            else:
                miss_adi[clsid].append(1.0)
                miss_bin.append(depth_idx)

    if flat["cls"]:
        cls_a = np.asarray(flat["cls"], np.int32)
        e3, e2 = scorer(jnp.asarray(cls_a), jnp.asarray(np.stack(flat["K"])),
                        jnp.asarray(np.stack(flat["gtR"])),
                        jnp.asarray(np.stack(flat["gtT"])),
                        jnp.asarray(np.stack(flat["pR"])),
                        jnp.asarray(np.stack(flat["pT"])))
        e3 = np.asarray(e3, np.float64)
        e2 = np.asarray(e2, np.float64)
        bins_a = np.asarray(flat["bin"])
    else:
        cls_a = np.zeros((0,), np.int32)
        e3 = e2 = np.zeros((0,), np.float64)
        bins_a = np.zeros((0,), np.int32)

    adi_per_class, auc_per_class, rep_per_class = [], [], []
    errs_adi_depth = [[] for _ in range(depth_bins)]
    errs_rep_depth = [[] for _ in range(depth_bins)]
    for clsid in range(class_num):
        sel = cls_a == clsid
        rel = e3[sel] / mesh_diameters[clsid]
        errors_adi = list(miss_adi[clsid]) + rel.tolist()
        errors_abs3d = [1e10] * len(miss_adi[clsid]) + e3[sel].tolist()
        errors_rep = [50.0] * len(miss_adi[clsid]) + e2[sel].tolist()
        for r, p, b in zip(rel, e2[sel], bins_a[sel]):
            errs_adi_depth[b].append(float(r))
            errs_rep_depth[b].append(float(p))
        n = len(errors_adi)
        if n > 0:
            adi_per_class.append({
                "ADI" + (f"{t:.2f}d").lstrip("0"):
                    100.0 * (np.asarray(errors_adi) < t).mean()
                for t in M.THRESHOLDS_ADI})
            auc_per_class.append(
                {"AUC    ": 100.0 * M.auc_metric(errors_abs3d, 100.0)})
            rep_per_class.append({
                f"REP{t:02d}px": 100.0 * (np.asarray(errors_rep) < t).mean()
                for t in M.THRESHOLDS_REP})
        else:
            adi_per_class.append({})
            auc_per_class.append({})
            rep_per_class.append({})
    for b in miss_bin:
        errs_adi_depth[b].append(1.0)
        errs_rep_depth[b].append(50.0)

    adi_per_depth, rep_per_depth = [], []
    for i in range(depth_bins):
        if errs_adi_depth[i]:
            adi_per_depth.append({
                "ADI" + (f"{t:.2f}d").lstrip("0"):
                    100.0 * (np.asarray(errs_adi_depth[i]) < t).mean()
                for t in M.THRESHOLDS_ADI})
            rep_per_depth.append({
                f"REP{t:02d}px": 100.0 * (np.asarray(errs_rep_depth[i]) < t).mean()
                for t in M.THRESHOLDS_REP})
        else:
            adi_per_depth.append({})
            rep_per_depth.append({})

    return dict(adi_per_class=adi_per_class, auc_per_class=auc_per_class,
                rep_per_class=rep_per_class, adi_per_depth=adi_per_depth,
                rep_per_depth=rep_per_depth, depth_range=[depth_min, depth_max])


class ScanEvaluator:
    """Drives the one-dispatch eval. Build once, `prepare()` the eval set
    once (stacks + uploads all images to device — they stay resident for
    every subsequent `run`, so training-time validation at VAL_FREQ pays
    the host pipeline + upload exactly once), then `run(variables)` per
    evaluation. Results match evaluator.valid (tests/test_eval_scan.py).
    """

    def __init__(self, cfg: Config, consts: TaskConsts, net,
                 meshes: Sequence[np.ndarray], forward=None,
                 device_metrics: bool = True):
        self.cfg, self.consts = cfg, consts
        self.meshes = meshes
        self.sym = cfg.data.symmetry_dict()
        self._run_fn = build_eval_scan(cfg, consts, net, forward=forward)
        self._scorer = (build_pose_diff_scorer(meshes, list(self.sym.keys()))
                        if device_metrics else None)
        self.device_metrics = device_metrics
        self._staged = None

    def share_staged(self, other: "ScanEvaluator") -> "ScanEvaluator":
        """Reuse another evaluator's uploaded eval set (and scorer, when the
        metric config matches) — e.g. the teacher sanity gate evaluates on
        the student's staged batches without a second upload."""
        if other._staged is None:
            raise RuntimeError("source evaluator not prepared")
        self._staged = other._staged
        if self.device_metrics and other._scorer is not None \
                and self.sym == other.sym:
            self._scorer = other._scorer
        return self

    def prepare(self, eval_batches: Iterable) -> "ScanEvaluator":
        """Stack (batch, metas) pairs into chunked arrays; upload images."""
        K_int = np.asarray(self.consts.K)
        imgs, bts, cids, metas = [], [], [], []
        for batch, ms in eval_batches:
            imgs.append(np.asarray(batch.images))
            bts.append(np.asarray(batch.bbox_trans))
            cids.append(np.asarray(batch.class_ids))
            metas.append(list(ms))
        if not imgs:
            raise ValueError("empty eval set")
        flat_metas = [m for ms in metas for m in ms]
        K_img = np.stack([np.asarray(m["K"], np.float32).reshape(3, 3)
                          for m in flat_metas])
        remap = ~np.array([np.allclose(k, K_int, atol=1e-4) for k in K_img])
        self._staged = dict(
            images=jax.device_put(np.stack(imgs)),
            bbox_trans=jax.device_put(np.stack(bts).astype(np.float32)),
            class_ids=jax.device_put(np.stack(cids)),
            K_img=jax.device_put(K_img),
            remap=jax.device_put(remap),
            metas=metas, flat_metas=flat_metas,
        )
        return self

    def run(self, variables, step: int = 0, working_dir: Optional[str] = None,
            logger: Optional[ScalarLogger] = None,
            rng: Optional[jax.Array] = None, verbose: bool = True) -> Dict:
        if self._staged is None:
            raise RuntimeError("call prepare(eval_batches) first")
        st = self._staged
        cfg = self.cfg
        n_chunks = len(st["metas"])
        # identical per-chunk key sequence to the streaming evaluator:
        # sequential host-side splits of the base key (threefry is
        # backend-deterministic; splitting on CPU avoids n_chunks tiny
        # tunnel round-trips)
        from .evaluator import _host_key_splitter
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        next_key = _host_key_splitter(rng)
        keys = np.stack([np.asarray(next_key()) for _ in range(n_chunks)])
        out = jax.device_get(self._run_fn(
            variables, st["images"], st["bbox_trans"], st["class_ids"],
            st["K_img"], st["remap"], jnp.asarray(keys)))

        preds: Dict[str, Dict] = {}
        for i, meta in enumerate(st["flat_metas"]):
            entry_preds: List = []
            if bool(out["valid"][i]):
                cls_id = int(out["cls"][i])
                R = np.asarray(out["R"][i], np.float64)
                T = np.asarray(out["T"][i], np.float64).reshape(3, 1)
                if np.isfinite(R).all() and np.isfinite(T).all():
                    if cls_id in self.sym:
                        R = geo.pose_symmetry_handling(
                            R, self.sym[cls_id]).astype(np.float64)
                    xy2d = np.asarray(out["kp2d"][i])[
                        np.asarray(out["vote_valid"][i], bool)]
                    entry_preds.append([float(out["score"][i]), cls_id,
                                        R.tolist(), T.tolist(),
                                        np.round(xy2d, 2).tolist()])
            preds[meta["filename"]] = {
                "meta": {
                    "K": np.asarray(meta["K"]).reshape(3, 3).tolist(),
                    "width": meta["width"], "height": meta["height"],
                    "class_ids": [int(c) for c in np.atleast_1d(meta["class_ids"])],
                    "rotations": np.asarray(meta["rotations"]).reshape(-1, 3, 3).tolist(),
                    "translations": np.asarray(meta["translations"]).reshape(-1, 3).tolist(),
                },
                "pred": entry_preds,
            }

        if jax.process_count() > 1:
            from ..parallel.mesh import gather_host_objects
            merged: Dict[str, Dict] = {}
            for shard in gather_host_objects(preds):
                merged.update(shard)
            preds = merged

        if working_dir and jax.process_index() == 0:
            os.makedirs(working_dir, exist_ok=True)
            with open(os.path.join(working_dir, "preds.json"), "w") as f:
                json.dump(preds, f)

        if self.device_metrics:
            results = evaluate_pose_predictions_device(
                preds, cfg.data.n_class, self.meshes,
                list(cfg.data.mesh_diameters), self.sym, scorer=self._scorer)
        else:
            results = M.evaluate_pose_predictions(
                preds, cfg.data.n_class, self.meshes,
                list(cfg.data.mesh_diameters), self.sym)
        if working_dir:
            from ..tools.visualizer import vis_accuracy_per_depth
            vis_accuracy_per_depth(results, os.path.join(
                working_dir, f"accuracy_per_depth_{step:06d}.png"))
        table = M.format_accuracy_table(results)
        if verbose:
            print(f"[valid @ step {step}]\n{table}")
        if logger is not None:
            scalars = {}
            for group, key, tag in (("adi_per_class", "ADI.10d", "ADI"),
                                    ("rep_per_class", "REP05px", "REP")):
                vals = []
                for ci, acc in enumerate(results[group]):
                    if key in acc:
                        scalars[f"{tag}/class_{ci:02d}"] = acc[key]
                        vals.append(acc[key])
                if vals:
                    scalars[f"{tag}/all_class"] = float(np.mean(vals))
            logger.log(step, scalars)
        results["table"] = table
        results["predictions"] = preds
        return results
