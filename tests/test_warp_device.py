"""Device-side warp (ops/warp.py) vs the host pipeline chain.

The frame-mode serving endpoint moves the host crop chain (reference
libs/dataset.py getitem_dzi two-warp composition) into the compiled
program; these tests pin the in-graph warp to the host implementation
(native C++ fixed-point / cv2) at <=1 LSB and the frame-mode StableHLO
artifact to the in-process function exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kd6d_pose_adlp_tpu.data import transforms as T
from kd6d_pose_adlp_tpu.data.pipeline import BOPPoseDataset
from kd6d_pose_adlp_tpu.ops import warp as dwarp
from kd6d_pose_adlp_tpu.utils import geometry as geo


def test_dzi_affine_rows_match_host():
    centers = np.array([[320.0, 240.0], [100.5, 411.25], [-20.0, 600.0]])
    scales = np.array([192.0, 97.5, 300.0])
    res = 256
    got = np.asarray(dwarp.dzi_affine_rows(jnp.asarray(centers),
                                           jnp.asarray(scales), res))
    for i in range(len(scales)):
        ref = geo.dzi_affine(centers[i], float(scales[i]), res)
        np.testing.assert_allclose(got[i], ref, rtol=1e-6, atol=1e-4)


def test_affine_compose_invert():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(4, 2, 3)).astype(np.float32)
    A[:, 0, 0] += 2.0
    A[:, 1, 1] += 2.0  # keep well-conditioned
    I = np.asarray(dwarp.compose_affine(jnp.asarray(A),
                                        dwarp.invert_affine(jnp.asarray(A))))
    eye = np.broadcast_to(np.array([[1, 0, 0], [0, 1, 0]], np.float32),
                          (4, 2, 3))
    np.testing.assert_allclose(I, eye, atol=1e-4)


def _host_frame_to_crop(raw, M_int3, center, scale, res, W, H):
    """The host fast-pipeline chain: one composed warp + internal blackout
    (data/pipeline.py sample(), fast path)."""
    Mc = geo.dzi_affine(center, scale, res)
    Mfull = np.vstack([Mc, [0.0, 0.0, 1.0]]).astype(np.float64) @ M_int3
    crop = T.warp_image(raw, Mfull, (res, res), border=(128, 128, 128))
    inside = BOPPoseDataset._inside_internal(Mc, res, W, H)
    if inside is not None:
        crop = crop.copy()
        crop[~inside] = 0
    return crop, Mc


@pytest.mark.parametrize("center,scale", [
    ((320.0, 240.0), 200.0),     # fully interior window
    ((30.0, 40.0), 260.0),       # spills past the raw image AND frame edge
    ((620.0, 455.0), 180.0),     # bottom-right, past the internal frame
])
def test_frame_to_crop_matches_host(center, scale):
    rng = np.random.default_rng(7)
    h, w = 375, 500                      # raw frame, non-4:3 so M_int != eye
    W, H, res = 640, 480, 128
    raw = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    M_int3 = np.asarray(T.internal_frame_matrix(w, h, W, H), np.float64)

    ref, Mc_ref = _host_frame_to_crop(raw, M_int3, np.asarray(center),
                                      scale, res, W, H)

    f = jax.jit(lambda fr, c, s: dwarp.frame_to_crop(
        fr, jnp.asarray(M_int3[:2], jnp.float32), c, s, res,
        internal_wh=(W, H)))
    crops, bt = f(jnp.asarray(raw[None]),
                  jnp.asarray(np.asarray(center, np.float32)[None]),
                  jnp.asarray(np.asarray([scale], np.float32)))
    got = np.asarray(crops[0]).astype(np.int32)

    np.testing.assert_allclose(np.asarray(bt[0]), Mc_ref, rtol=1e-5,
                               atol=1e-3)
    diff = np.abs(got - ref.astype(np.int32))
    # bilinear rounding differences only (host warp is fixed-point)
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).mean() < 0.05, "more than 5% of pixels off by 1 LSB"


@pytest.mark.slow
def test_frame_mode_export_roundtrip(tmp_path):
    """The frame-mode artifact reproduces the in-process raw-frame endpoint
    and agrees with the crop endpoint fed its own device crops."""
    import dataclasses

    from kd6d_pose_adlp_tpu.config import Config, ModelConfig
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.serving import (build_frame_infer_fn,
                                                   build_infer_fn,
                                                   export_inference,
                                                   load_serving)
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

    RES = 128
    fh, fw = 240, 320
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h", input_res=RES,
                                   compute_dtype="float32"))
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=RES,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    consts = ds.consts()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, mesh_diameters=tuple(np.asarray(consts.diameters))))
    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)))

    path = str(tmp_path / "frame.hlo")
    meta = export_inference(cfg, consts, variables, path, batch_size=2,
                            mode="frame", platforms=("cpu",),
                            frame_hw=(fh, fw))
    assert meta["mode"] == "frame" and meta["frame_hw"] == [fh, fw]

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, fh, fw, 3), dtype=np.uint8)
    centers = np.array([[320.0, 240.0], [280.0, 300.0]], np.float32)
    scales = np.array([220.0, 180.0], np.float32)
    ids = np.zeros((2,), np.int32)

    direct = jax.jit(build_frame_infer_fn(cfg, consts, variables, (fh, fw)))
    ref = jax.device_get(direct(jnp.asarray(frames), jnp.asarray(centers),
                                jnp.asarray(scales), jnp.asarray(ids),
                                jnp.asarray(9, jnp.uint32)))
    serve, meta2 = load_serving(path)
    got = jax.device_get(serve(frames, centers, scales, ids, seed=9))
    assert meta2["mode"] == "frame"
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)

    # composition check: frame endpoint == crop endpoint on its own crops
    W, H = cfg.data.internal_width, cfg.data.internal_height
    M_int = np.asarray(T.internal_frame_matrix(fw, fh, W, H)[:2], np.float32)
    crops, bt = dwarp.frame_to_crop(jnp.asarray(frames), jnp.asarray(M_int),
                                    jnp.asarray(centers), jnp.asarray(scales),
                                    RES, internal_wh=(W, H))
    crop_fn = jax.jit(build_infer_fn(cfg, consts, variables))
    ref2 = jax.device_get(crop_fn(crops, bt, jnp.asarray(ids),
                                  jnp.asarray(9, jnp.uint32)))
    # the fused frame program may round a handful of crop pixels one LSB
    # differently than the standalone warp (FMA contraction inside the
    # composed lowering), shifting votes by hundredths of a pixel — allow
    # that, not more
    for k in ref2:
        np.testing.assert_allclose(np.asarray(got[k]).astype(np.float32),
                                   np.asarray(ref2[k]).astype(np.float32),
                                   rtol=1e-3, atol=0.5, err_msg=k)
