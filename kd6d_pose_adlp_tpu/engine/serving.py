"""Model export & serving: the compiled inference endpoint as a portable,
versioned StableHLO artifact (`jax.export`).

Deployment story the reference lacks (its inference surface is test.py's
eval loop only): `build_infer_fn` closes the trained weights, the network,
the voting/RANSAC-EPnP/LHM postprocess, and the task constants into ONE
pure function `(images, bbox_trans, class_ids, seed) -> poses`;
`export_inference` lowers it once per requested platform (cpu, tpu) and
serializes the whole thing — weights baked in as constants — to a single
file a serving runtime can execute without the Python model definition,
the config system, or the checkpoint format. `load_serving` is that
runtime side: deserialize + jit, nothing else.

The endpoint is fixed-shape and data-independent end to end (static vote
quotas, one-hot-weighted RANSAC hypotheses), so one artifact per batch
size is the complete serving contract — no dynamic-shape fallbacks.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.batch import Batch, TaskConsts
from ..models.pose_net import PoseNet
from ..ops import warp as dwarp
from .postprocess import build_postprocess, build_postprocess_multi

# serving outputs, in a fixed order so consumers can rely on it
SINGLE_KEYS = ("R", "T", "score", "cls", "n_inliers", "valid", "kp2d",
               "vote_valid")
MULTI_KEYS = ("R", "T", "score", "cls", "n_inliers", "valid")


def build_infer_fn(cfg: Config, consts: TaskConsts, variables,
                   mode: str = "single"):
    """Pure inference endpoint over a trained model.

    Args of the returned function (all fixed-shape):
      images     (B, res, res, 3) uint8 BGR crop or pre-normalized float RGB
      bbox_trans (B, 2, 3) f32 — the DZI crop affine of each image
      class_ids  (B,) int32 — the class to solve (mode="single"; a negative
                 id marks the image invalid). Ignored for mode="multi",
                 which votes + solves every foreground class per image.
      seed       () uint32 — RANSAC randomness; fixed seed = bitwise-
                 reproducible serving.

    Returns a dict of arrays in SINGLE_KEYS / MULTI_KEYS order. Weights and
    task constants are closed over (baked into the exported artifact).
    """
    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    if mode == "multi":
        pp = build_postprocess_multi(cfg, consts, cfg.data.n_fg)
        keys = MULTI_KEYS
    else:
        pp = build_postprocess(cfg, consts)
        keys = SINGLE_KEYS
    G = cfg.solver.max_objs
    res = cfg.model.input_res

    def infer(images, bbox_trans, class_ids, seed):
        B = images.shape[0]
        cls_logits, pred_reg = net.apply(variables, images, train=False)
        # postprocess reads only class_ids[:, 0] and bbox_trans from Batch;
        # the training-only fields are zero-filled to satisfy the pytree
        cls_arr = jnp.full((B, G), -1, jnp.int32).at[:, 0].set(
            class_ids.astype(jnp.int32))
        batch = Batch(images=images,
                      mask=jnp.zeros((B, res, res), jnp.int32),
                      class_ids=cls_arr,
                      rotations=jnp.zeros((B, G, 3, 3), jnp.float32),
                      translations=jnp.zeros((B, G, 3), jnp.float32),
                      bbox_trans=bbox_trans.astype(jnp.float32))
        rng = jax.random.PRNGKey(seed.astype(jnp.uint32))
        out = pp(cls_logits, pred_reg, batch, rng)
        return {k: out[k] for k in keys}

    return infer


def build_frame_infer_fn(cfg: Config, consts: TaskConsts, variables,
                         frame_hw: Tuple[int, int], mode: str = "single"):
    """Raw-frame inference endpoint: the host image pipeline moved on device.

    Where `build_infer_fn` expects a pre-cropped 256² image (forcing the
    caller to run the cv2/C++ crop chain), this endpoint takes RAW camera
    frames plus a detection window and performs the keep-ratio internal-frame
    fit + DZI crop inside the compiled program (`ops/warp.py`) — zero host
    image ops at serving time, and the whole raw-pixels->poses path ships in
    one StableHLO artifact. Reference equivalent: libs/dataset.py getitem_dzi
    two-warp chain (host, cv2); here it is ONE composed in-graph warp.

    Args of the returned function:
      frames    (B, frame_h, frame_w, 3) uint8 BGR raw camera frames
      centers   (B, 2) f32 — DZI window center in INTERNAL-frame coords
      scales    (B,)  f32 — DZI window side in internal coords
      class_ids (B,) int32; seed () uint32 — as in `build_infer_fn`.
    """
    h, w = frame_hw
    W, H = cfg.data.internal_width, cfg.data.internal_height
    res = cfg.model.input_res
    # static raw->internal fit of this frame size (host: transforms.py:27)
    from ..data.transforms import internal_frame_matrix
    M_int = np.asarray(internal_frame_matrix(w, h, W, H)[:2], np.float32)
    base = build_infer_fn(cfg, consts, variables, mode=mode)

    def infer(frames, centers, scales, class_ids, seed):
        crops, bbox_trans = dwarp.frame_to_crop(
            frames, jnp.asarray(M_int), centers.astype(jnp.float32),
            scales.astype(jnp.float32), res, internal_wh=(W, H))
        out = base(crops, bbox_trans, class_ids, seed)
        # kp2d (and the bbox_trans consumers) are in internal-frame coords,
        # same as the crop endpoint fed by the host pipeline
        return out

    return infer


def export_inference(cfg: Config, consts: TaskConsts, variables,
                     path: str, batch_size: int = 1, mode: str = "single",
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     frame_hw: Optional[Tuple[int, int]] = None) -> dict:
    """Serialize the inference endpoint to `path` (+ `path`.json metadata).

    Lowers for every requested platform in one artifact; if a platform's
    lowering is unavailable in this process (e.g. no TPU plugin), it is
    dropped with a note rather than failing the export. Returns metadata.

    `batch_size=0` exports with a SYMBOLIC batch dimension: one artifact
    accepts any batch size (the serving runtime still specializes/compiles
    once per concrete size it sees — use a fixed size for the lowest
    first-request latency on TPU).
    """
    from jax import export as jexport

    if mode == "frame":
        if frame_hw is None:
            raise ValueError("mode='frame' requires frame_hw=(height, width)")
        infer = build_frame_infer_fn(cfg, consts, variables, frame_hw)
    else:
        infer = build_infer_fn(cfg, consts, variables, mode=mode)
    res = cfg.model.input_res
    if batch_size == 0:
        (bdim,) = jexport.symbolic_shape("b", constraints=["b >= 1"])
    else:
        bdim = batch_size
    if mode == "frame":
        fh, fw = frame_hw
        args = (
            jax.ShapeDtypeStruct((bdim, fh, fw, 3), jnp.uint8),
            jax.ShapeDtypeStruct((bdim, 2), jnp.float32),
            jax.ShapeDtypeStruct((bdim,), jnp.float32),
            jax.ShapeDtypeStruct((bdim,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.uint32),
        )
    else:
        args = (
            jax.ShapeDtypeStruct((bdim, res, res, 3), jnp.uint8),
            jax.ShapeDtypeStruct((bdim, 2, 3), jnp.float32),
            jax.ShapeDtypeStruct((bdim,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.uint32),
        )

    plats, exported, err = list(platforms), None, None
    while plats:
        try:
            exported = jexport.export(jax.jit(infer), platforms=plats)(*args)
            break
        except Exception as e:  # noqa: BLE001 — per-platform lowering gaps
            err = f"{type(e).__name__}: {e}"
            plats = plats[:-1]
    if exported is None:
        raise RuntimeError(f"export failed for all platforms: {err}")

    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "platforms": plats,
        "dropped_platforms": [p for p in platforms if p not in plats],
        "drop_reason": err if len(plats) != len(platforms) else None,
        "mode": mode,
        "frame_hw": list(frame_hw) if frame_hw else None,
        "batch_size": batch_size if batch_size else "symbolic",
        "input_res": res,
        "n_fg": cfg.data.n_fg,
        "backbone": cfg.model.backbone,
        "bytes": len(blob),
        "calling_convention": getattr(exported, "calling_convention_version",
                                      None),
        "output_keys": list(MULTI_KEYS if mode == "multi" else SINGLE_KEYS),
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_serving(path: str, meta: Optional[dict] = None):
    """Deserialize an exported artifact; returns (callable, metadata).

    The callable takes (images, bbox_trans, class_ids, seed) and returns the
    output dict — same contract as `build_infer_fn`, no model code needed.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    if meta is None and os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    call = jax.jit(exported.call)

    if (meta or {}).get("mode") == "frame":
        def serve(frames, centers, scales, class_ids, seed=0):
            return call(jnp.asarray(frames),
                        jnp.asarray(centers, jnp.float32),
                        jnp.asarray(scales, jnp.float32),
                        jnp.asarray(class_ids, jnp.int32),
                        jnp.asarray(seed, jnp.uint32))
    else:
        def serve(images, bbox_trans, class_ids, seed=0):
            return call(jnp.asarray(images),
                        jnp.asarray(bbox_trans, jnp.float32),
                        jnp.asarray(class_ids, jnp.int32),
                        jnp.asarray(seed, jnp.uint32))

    return serve, (meta or {})


def centered_bbox_trans(batch_size: int, res: int) -> np.ndarray:
    """Identity-crop affine stack for callers serving pre-cropped images
    (kp2d outputs then stay in the crop's own pixel frame)."""
    M = np.zeros((batch_size, 2, 3), np.float32)
    M[:, 0, 0] = 1.0
    M[:, 1, 1] = 1.0
    return M
