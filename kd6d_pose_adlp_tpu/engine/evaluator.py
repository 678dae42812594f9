"""Evaluation loop: forward -> postprocess -> remap -> metrics -> preds.json.

Equivalent of the reference `valid()` (`libs/eval_libs.py:45-149`): per batch
the compiled forward+postprocess runs on device; pose remapping to each
image's native intrinsics (PnP refit, `libs/evaluate.py:174-195`), symmetry
canonicalization and metric aggregation run on host, streaming, so the TPU is
never blocked on Python.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np

from ..config import Config
from ..data.batch import TaskConsts
from ..utils import geometry as geo
from ..utils import metrics as M
from ..utils.logging_utils import ScalarLogger


def remap_pose_host(src_K: np.ndarray, R: np.ndarray, T: np.ndarray,
                    pt3d: np.ndarray, dst_K: np.ndarray):
    """Re-fit (R, T) under a different K by reprojecting the 8 corners and
    solving PnP (reference libs/utils.py:504-526). Uses cv2 EPnP when present,
    else the in-repo EPnP."""
    M3 = dst_K @ np.linalg.inv(src_K)
    pts = M3 @ (src_K @ (R @ pt3d.T + T.reshape(3, 1)))
    xy2d = (pts[:2] / (pts[2:] + 1e-8)).T.astype(np.float64)
    try:
        import cv2
        ok, rvec, tvec = cv2.solvePnP(
            pt3d.reshape(-1, 1, 3).astype(np.float64), xy2d.reshape(-1, 1, 2),
            dst_K.astype(np.float64), None, flags=cv2.SOLVEPNP_EPNP)
        if ok:
            return cv2.Rodrigues(rvec)[0], tvec.reshape(3, 1)
    except ImportError:
        pass
    import jax.numpy as jnp
    from ..ops.epnp import epnp
    Rh, Th = epnp(jnp.asarray(pt3d, jnp.float32), jnp.asarray(xy2d, jnp.float32),
                  jnp.asarray(dst_K, jnp.float32), jnp.ones((len(pt3d),), jnp.float32))
    return np.asarray(Rh, np.float64), np.asarray(Th, np.float64).reshape(3, 1)


def _staged_iter(eval_batches: Iterable, stage: bool = True):
    """Iterate (batch, metas) while ONE background thread pre-builds the next
    item and starts its host->device image upload.

    The eval loop's per-batch host->device traffic is dominated by the uint8
    image crops (~4.7 MB at batch 24); through the remote-tunnel relay that
    upload blocks the dispatching thread for most of the batch period.
    `jax.device_put` releases the GIL during the transfer, so staging it (and
    any lazy batch construction the iterator does) in a worker overlaps both
    with the host consume pass. Order-preserving, exception-transparent;
    `stage=False` degrades to plain iteration (the A/B control)."""
    it = iter(eval_batches)
    if not stage:
        yield from it
        return
    from concurrent.futures import ThreadPoolExecutor

    def _one():
        nxt = next(it, None)
        if nxt is None:
            return None
        batch, metas = nxt
        try:
            batch = batch._replace(images=jax.device_put(batch.images))
        except Exception:
            pass  # fail-soft: un-staged arrays still upload at dispatch time
        return batch, metas

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(_one)
        while True:
            item = fut.result()
            if item is None:
                return
            fut = pool.submit(_one)
            yield item


def _host_key_splitter(rng):
    """Per-batch PRNG splitting without a per-batch device dispatch.

    `jax.random.split` is a (tiny) compiled op: on the tunnel-attached TPU
    each call is a remote round-trip. Threefry is backend-deterministic, so
    splitting on the host CPU backend yields bit-identical keys; the key is
    returned as host numpy (uncommitted) so the downstream jit can place it.
    Falls back to on-device splitting when no CPU backend exists."""
    on_cpu = False
    try:
        rng = jax.device_put(rng, jax.devices("cpu")[0])
        on_cpu = True
    except Exception:
        pass
    state = [rng]

    def next_key():
        state[0], sub = jax.random.split(state[0])
        if on_cpu:
            try:
                return np.asarray(sub)  # old-style uint32 key
            except TypeError:
                # typed key array: returning the CPU-committed key would
                # raise a committed-device conflict inside the TPU-jitted
                # consumer (advisor r4). Strip to raw key data on the host
                # and re-wrap UNCOMMITTED so the jit can place it freely.
                return jax.random.wrap_key_data(
                    np.asarray(jax.random.key_data(sub)),
                    impl=jax.random.key_impl(sub))
        return sub

    return next_key


def valid(cfg: Config, consts: TaskConsts, variables, forward_fn, postprocess_fn,
          eval_batches: Iterable, meshes: Sequence[np.ndarray],
          step: int = 0, working_dir: Optional[str] = None,
          logger: Optional[ScalarLogger] = None, rng: Optional[jax.Array] = None,
          verbose: bool = True, overlap: bool = True, stage: bool = True) -> Dict:
    """eval_batches yields (Batch, metas) where metas is a list of per-image
    dicts with keys: filename, K, width, height, class_ids, rotations,
    translations. Returns the metric structures of
    `evaluate_pose_predictions` plus the per-class headline table string."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    sym = cfg.data.symmetry_dict()
    kp3d = np.asarray(consts.kp3d)
    K_int = np.asarray(consts.K)

    preds: Dict[str, Dict] = {}

    def consume(out, metas):
        for i, meta in enumerate(metas):
            entry_preds: List = []
            if bool(out["valid"][i]):
                cls_id = int(out["cls"][i])
                R = np.asarray(out["R"][i], np.float64)
                T = np.asarray(out["T"][i], np.float64).reshape(3, 1)
                if np.isfinite(R).all() and np.isfinite(T).all():
                    K_img = np.asarray(meta["K"], np.float64).reshape(3, 3)
                    if not np.allclose(K_img, K_int, atol=1e-4):
                        R, T = remap_pose_host(K_int, R, T,
                                               kp3d[cls_id].astype(np.float64), K_img)
                    if cls_id in sym:
                        R = geo.pose_symmetry_handling(R, sym[cls_id]).astype(np.float64)
                    # voted 2D keypoints (internal frame) alongside the pose,
                    # like the reference's per-prediction xy2d
                    # (postprocess/postprocess.py:199-202): the valid voted
                    # cells' (8,2) keypoint sets that fed PnP
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

    # Double-buffered device/host overlap (round-3 finding: the serial
    # forward -> device_get -> per-image-Python loop capped eval at ~1.5k
    # img/s while inference alone runs 25k). Dispatch batch i+1's
    # forward+postprocess (async under jax's dispatch model) BEFORE
    # blocking on batch i's device_get, so the chip computes i+1 while the
    # host runs Python on i. Reference hot loop: libs/eval_libs.py:59-95.
    # overlap=False restores the serial order (the A/B control for
    # scripts/bench_eval_overlap.py; results are identical either way —
    # only the dispatch timing changes). stage=True additionally pre-uploads
    # the next batch's images from a worker thread (_staged_iter) and splits
    # the per-batch RANSAC key on the host (_host_key_splitter) — both pure
    # scheduling changes, pinned identical by tests/test_eval_overlap.py.
    next_key = _host_key_splitter(rng)
    pending = None
    for batch, metas in _staged_iter(eval_batches, stage):
        cls_logits, pred_reg = forward_fn(variables, batch.images)
        dev_out = postprocess_fn(cls_logits, pred_reg, batch, next_key())
        if pending is not None:
            consume(jax.device_get(pending[0]), pending[1])
        if overlap:
            pending = (dev_out, metas)
        else:
            consume(jax.device_get(dev_out), metas)
    if pending is not None:
        consume(jax.device_get(pending[0]), pending[1])

    # multi-host eval: each process evaluates its own shard of eval_batches;
    # merge the prediction dicts across processes before scoring (replaces
    # the reference's pickle-over-ByteTensor all_gather,
    # libs/distributed.py:44-76 via libs/train_libs.py:49-60)
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

    results = M.evaluate_pose_predictions(
        preds, cfg.data.n_class, meshes, list(cfg.data.mesh_diameters), sym)
    if working_dir:
        from ..tools.visualizer import vis_accuracy_per_depth
        vis_accuracy_per_depth(results, os.path.join(
            working_dir, f"accuracy_per_depth_{step:06d}.png"))
    table = M.format_accuracy_table(results)
    if verbose:
        print(f"[valid @ step {step}]\n{table}")
    if logger is not None:
        # ADI + REP scalars per class and averaged, like the reference's
        # eval logging (libs/eval_libs.py:112-146 writes both families)
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


def detection_stats(cfg: Config, consts: TaskConsts, variables, forward_fn,
                    eval_batches: Iterable, n_fg: int,
                    rng: Optional[jax.Array] = None,
                    verbose: bool = True) -> Dict:
    """Detection-style evaluation over ALL classes (build_postprocess_multi):
    per image, every foreground class is voted and solved; reports the
    GT-class recovery rate (valid prediction for the true class), the mean
    false positives per image (valid predictions for absent classes), and
    the GT-class ADD/ADI<0.1d rate. Measures the cost/benefit of
    detection-mode eval on multi-object-capable crops (round-1 review left
    this unmeasured)."""
    from .postprocess import build_postprocess_multi

    def add_err(Rp, Tp, Rg, Tg, pts):
        return float(np.linalg.norm((pts @ Rp.T + Tp) - (pts @ Rg.T + Tg),
                                    axis=-1).mean())

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    predict = build_postprocess_multi(cfg, consts, n_fg)
    kp3d = np.asarray(consts.kp3d)
    diam = np.asarray(consts.diameters)

    n_gt = n_rec = n_img = 0
    n_fp = 0
    n_adi = 0

    def consume(out, batch):
        nonlocal n_gt, n_rec, n_img, n_fp, n_adi
        ids = np.asarray(batch.class_ids)
        Rg = np.asarray(batch.rotations)
        Tg = np.asarray(batch.translations)
        B, G = ids.shape
        for i in range(B):
            n_img += 1
            present = {int(c) for c in ids[i] if c >= 0}
            n_fp += int(sum(bool(out["valid"][i, c])
                            for c in range(n_fg) if c not in present))
            for g in range(G):
                c = int(ids[i, g])
                if c < 0:
                    continue
                n_gt += 1
                if not bool(out["valid"][i, c]):
                    continue
                n_rec += 1
                e = add_err(np.asarray(out["R"][i, c], np.float64),
                            np.asarray(out["T"][i, c], np.float64),
                            Rg[i, g].astype(np.float64),
                            Tg[i, g].astype(np.float64),
                            kp3d[c].astype(np.float64))
                if e < 0.1 * diam[c]:
                    n_adi += 1

    # double-buffered + staged like valid(): batch i+1 uploads and computes
    # while the host scores batch i
    next_key = _host_key_splitter(rng)
    pending = None
    for batch, metas in _staged_iter(eval_batches):
        cls_logits, pred_reg = forward_fn(variables, batch.images)
        dev_out = predict(cls_logits, pred_reg, batch, next_key())
        if pending is not None:
            consume(jax.device_get(pending[0]), pending[1])
        pending = (dev_out, batch)
    if pending is not None:
        consume(jax.device_get(pending[0]), pending[1])

    stats = {
        "gt_objects": n_gt,
        "recovery_rate": round(100.0 * n_rec / max(n_gt, 1), 2),
        "adi10_rate": round(100.0 * n_adi / max(n_gt, 1), 2),
        "false_pos_per_image": round(n_fp / max(n_img, 1), 3),
        "images": n_img,
    }
    if verbose:
        print(f"[detection mode] {stats}")
    return stats
