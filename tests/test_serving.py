"""Serving/export subsystem: the StableHLO artifact must reproduce the
in-process model exactly, from bytes on disk, without the model code path
(engine/serving.py; additive over the reference, whose only inference
surface is test.py's eval loop).

One bs-2 artifact is exported once per module (exports cost a full
endpoint lowering, ~2 min each on this 1-core box) and shared by the fast
tests; the extra-lowering variants (multi-class, symbolic batch,
platform fallback) are marked slow."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kd6d_pose_adlp_tpu.config import Config, ModelConfig
from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
from kd6d_pose_adlp_tpu.engine.serving import (MULTI_KEYS, SINGLE_KEYS,
                                               build_infer_fn,
                                               centered_bbox_trans,
                                               export_inference, load_serving)
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet

RES = 128


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h", input_res=RES,
                                   compute_dtype="float32"))
    ds = SyntheticPoseDataset(n_fg=cfg.data.n_fg, input_res=RES,
                              max_objs=cfg.solver.max_objs, single_class=0,
                              seed=0)
    import dataclasses
    consts = ds.consts()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, mesh_diameters=tuple(np.asarray(consts.diameters))))
    net = PoseNet(cfg=cfg.model, n_fg=cfg.data.n_fg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)))
    return cfg, consts, variables


@pytest.fixture(scope="module")
def artifact(setup, tmp_path_factory):
    """(path, meta) of one bs-2 single-mode cpu artifact, exported once."""
    cfg, consts, variables = setup
    path = str(tmp_path_factory.mktemp("serving") / "model.hlo")
    meta = export_inference(cfg, consts, variables, path, batch_size=2,
                            mode="single", platforms=("cpu",))
    return path, meta


def _example(bs):
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (bs, RES, RES, 3), dtype=np.uint8)
    return (images, centered_bbox_trans(bs, RES),
            np.zeros((bs,), np.int32))


def test_export_roundtrip_single(setup, artifact):
    cfg, consts, variables = setup
    path, meta = artifact
    assert meta["bytes"] > 0 and meta["platforms"] == ["cpu"]
    assert meta["output_keys"] == list(SINGLE_KEYS)

    images, bt, ids = _example(2)
    direct = jax.jit(build_infer_fn(cfg, consts, variables))
    ref = jax.device_get(direct(jnp.asarray(images), jnp.asarray(bt),
                                jnp.asarray(ids), jnp.asarray(3, jnp.uint32)))
    serve, meta2 = load_serving(path)
    got = jax.device_get(serve(images, bt, ids, seed=3))
    assert meta2["input_res"] == RES
    for k in SINGLE_KEYS:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    # a different seed must change the RANSAC draw, not crash
    _ = serve(images, bt, ids, seed=11)


def test_serving_respects_invalid_class(artifact):
    path, _ = artifact
    serve, _ = load_serving(path)
    images, bt, ids = _example(2)
    ids = np.array([0, -1], np.int32)  # image 1 marked invalid
    out = jax.device_get(serve(images, bt, ids, seed=0))
    assert not bool(out["valid"][1])


@pytest.mark.slow
def test_quant_export_roundtrip(setup, tmp_path):
    """The int8 PTQ artifact (export_model.py --fold_bn --quant): the
    exported StableHLO must reproduce the in-process quantized net exactly,
    and the int8 weights must shrink the artifact materially vs float
    (measured 9.5 -> 3.7 MB on the production res-256 export)."""
    import dataclasses

    from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm
    from kd6d_pose_adlp_tpu.utils.quant import quantize_posenet

    cfg, consts, variables = setup
    images, bt, ids = _example(2)

    folded = fold_batchnorm(variables)
    cfg_f = cfg.replace(model=dataclasses.replace(cfg.model, bn_folded=True))
    net_q, qvars = quantize_posenet(cfg_f.model, cfg.data.n_fg, folded,
                                    [jnp.asarray(images)])
    cfg_q = cfg_f.replace(model=dataclasses.replace(cfg_f.model,
                                                    quant_mode="quant"))

    path_f = str(tmp_path / "float.hlo")
    path_q = str(tmp_path / "int8.hlo")
    meta_f = export_inference(cfg_f, consts, folded, path_f, batch_size=2,
                              mode="single", platforms=("cpu",))
    meta_q = export_inference(cfg_q, consts, qvars, path_q, batch_size=2,
                              mode="single", platforms=("cpu",))
    assert meta_q["bytes"] < 0.6 * meta_f["bytes"], (meta_q, meta_f)

    direct = jax.jit(build_infer_fn(cfg_q, consts, qvars))
    ref = jax.device_get(direct(jnp.asarray(images), jnp.asarray(bt),
                                jnp.asarray(ids), jnp.asarray(3, jnp.uint32)))
    serve, _ = load_serving(path_q)
    got = jax.device_get(serve(images, bt, ids, seed=3))
    for k in SINGLE_KEYS:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_export_multi_mode(setup, tmp_path):
    cfg, consts, variables = setup
    path = str(tmp_path / "multi.hlo")
    meta = export_inference(cfg, consts, variables, path, batch_size=1,
                            mode="multi", platforms=("cpu",))
    assert meta["output_keys"] == list(MULTI_KEYS)
    serve, _ = load_serving(path)
    images, bt, ids = _example(1)
    out = jax.device_get(serve(images, bt, ids, seed=0))
    # per-class outputs: (B, n_fg, ...)
    assert out["R"].shape == (1, cfg.data.n_fg, 3, 3)
    assert out["valid"].shape == (1, cfg.data.n_fg)


@pytest.mark.slow
def test_symbolic_batch_export(setup, tmp_path):
    """batch_size=0 exports a symbolic batch dim: ONE artifact serves any
    batch size, matching per-size direct computation."""
    cfg, consts, variables = setup
    path = str(tmp_path / "sym.hlo")
    meta = export_inference(cfg, consts, variables, path, batch_size=0,
                            platforms=("cpu",))
    assert meta["batch_size"] == "symbolic"
    serve, _ = load_serving(path)
    direct = jax.jit(build_infer_fn(cfg, consts, variables))
    for bs in (1, 3):
        images, bt, ids = _example(bs)
        ref = jax.device_get(direct(jnp.asarray(images), jnp.asarray(bt),
                                    jnp.asarray(ids),
                                    jnp.asarray(5, jnp.uint32)))
        got = jax.device_get(serve(images, bt, ids, seed=5))
        assert got["R"].shape == (bs, 3, 3)
        np.testing.assert_allclose(np.asarray(got["R"]), np.asarray(ref["R"]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_platform_fallback(setup, tmp_path):
    """Unavailable platforms are dropped with a recorded reason instead of
    failing the export (a CPU-only process exporting for cpu+tpu)."""
    cfg, consts, variables = setup
    path = str(tmp_path / "fb.hlo")
    meta = export_inference(cfg, consts, variables, path, batch_size=1,
                            platforms=("cpu", "tpu"))
    # either both lowered (fine) or tpu was dropped with a reason
    if meta["dropped_platforms"]:
        assert meta["dropped_platforms"] == ["tpu"]
        assert meta["drop_reason"]
    assert "cpu" in meta["platforms"]
