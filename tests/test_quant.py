"""int8 post-training quantization (utils/quant + models/blocks.QConv).

The PTQ path trades <1 LSB of conv precision for the v5e MXU's 2x int8
peak on frozen forwards (serving artifact, live KD teacher). These tests
pin: the weight quantizer's error bound, the QConv int8 math against a
plain-numpy oracle, the calibrate->quantize pipeline structure, and
end-to-end closeness of the quantized PoseNet to its BN-folded float
source. No reference counterpart (the reference serves f32 torch).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kd6d_pose_adlp_tpu.config import ModelConfig
from kd6d_pose_adlp_tpu.models.blocks import QConv
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
from kd6d_pose_adlp_tpu.utils.fold_bn import fold_batchnorm
from kd6d_pose_adlp_tpu.utils.quant import (build_quant_variables,
                                            calibrate_amax, quantize_kernel,
                                            quantize_posenet)


def test_quantize_kernel_error_bound_and_range():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * rng.uniform(
        0.01, 3.0, size=(16,)).astype(np.float32)
    kq, w_scale = quantize_kernel(k)
    assert kq.dtype == np.int8 and w_scale.shape == (16,)
    assert np.abs(kq).max() <= 127
    # dequantization error is at most half a quantization step per element
    err = np.abs(kq.astype(np.float64) * w_scale - k)
    assert (err <= 0.5 * w_scale + 1e-12).all()
    # each output channel actually uses the full int8 range
    assert (np.abs(kq).max(axis=(0, 1, 2)) == 127).all()


def test_qconv_matches_numpy_oracle():
    """QConv mode='quant' must compute exactly:
    dequant(conv_int32(quant(x), kernel_q)) * scales + bias."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32)) * 2.0
    kq = rng.integers(-127, 128, (3, 3, 3, 5)).astype(np.int8)
    w_scale = rng.uniform(0.001, 0.1, 5).astype(np.float32)
    bias = rng.normal(size=5).astype(np.float32)
    in_scale = np.float32(0.05)
    conv = QConv(5, 3, mode="quant")
    y = conv.apply({"quant": {"kernel_q": kq, "w_scale": w_scale,
                              "bias": bias, "in_scale": in_scale}}, x)

    # numpy oracle: int32 accumulation over the same SAME-padded window
    xq = np.clip(np.round(np.asarray(x, np.float64) / in_scale),
                 -127, 127).astype(np.int32)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = np.zeros((2, 8, 8, 5), np.int64)
    for i in range(3):
        for j in range(3):
            acc += np.einsum("bhwc,co->bhwo",
                             xp[:, i:i + 8, j:j + 8, :],
                             kq[i, j].astype(np.int64))
    want = acc.astype(np.float64) * (float(in_scale) * w_scale) + bias
    # QConv dequantizes in f32; the oracle in f64 — allow f32 rounding
    np.testing.assert_allclose(np.asarray(y, np.float64), want,
                               rtol=1e-5, atol=1e-6)


def _tiny_net_and_folded():
    cfg = ModelConfig(backbone="darknet_tiny_h", input_res=64,
                      use_higher_levels=False)
    net = PoseNet(cfg=cfg, n_fg=3)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    folded = fold_batchnorm(variables)
    cfg_f = dataclasses.replace(cfg, bn_folded=True)
    return cfg_f, folded, x


def test_calibrate_amax_is_running_max():
    cfg_f, folded, x = _tiny_net_and_folded()
    net_c = PoseNet(cfg=dataclasses.replace(cfg_f, quant_mode="calibrate"),
                    n_fg=3)
    s1 = calibrate_amax(net_c, folded, [x])
    s2 = calibrate_amax(net_c, folded, [x, x * 3.0])
    ge = jax.tree_util.tree_map(lambda a, b: bool((b >= a).all()), s1, s2)
    assert all(jax.tree_util.tree_leaves(ge))


def test_quantize_posenet_structure_and_closeness():
    cfg_f, folded, x = _tiny_net_and_folded()
    net_f = PoseNet(cfg=cfg_f, n_fg=3)
    c0, r0 = net_f.apply(folded, x, train=False)

    net_q, qvars = quantize_posenet(cfg_f, 3, folded, [x])
    # every quantized conv moved out of params: no f32 'kernel' leaf may
    # coexist with a 'quant' entry at the same path
    def paths(tree, leaf):
        out = set()
        def rec(t, p):
            for k, v in t.items():
                if k == leaf:
                    out.add(p)
                elif isinstance(v, dict):
                    rec(v, p + (k,))
        rec(tree, ())
        return out
    q_paths = paths(qvars["quant"], "kernel_q")
    p_paths = paths(qvars["params"], "kernel")
    assert q_paths, "no convs were quantized"
    assert not (q_paths & p_paths)
    # head output convs stay float (accuracy-sensitive)
    assert ("head", "cls_logits") in p_paths
    assert ("head", "pose_pred") in p_paths
    # backbone + FPN + towers all quantized
    assert any(p[0] == "backbone" for p in q_paths)
    assert any(p[0] == "fpn" for p in q_paths)
    assert any(p[0] == "head" for p in q_paths)

    c1, r1 = net_q.apply(qvars, x, train=False)
    assert c1.shape == c0.shape and r1.shape == r0.shape
    # int8 forward stays close to the folded float forward even on a
    # random-init net (trained nets are far cleaner: the 384-scene eval
    # A/B in scripts/bench_quant.py scores identical ADI)
    rel_c = float(jnp.abs(c1 - c0).max() / (jnp.abs(c0).max() + 1e-9))
    assert rel_c < 0.05, rel_c
    assert bool(jnp.isfinite(r1).all())


def test_quant_requires_folded():
    from kd6d_pose_adlp_tpu.models.blocks import ConvBNAct
    with pytest.raises(AssertionError):
        ConvBNAct(4, folded=False, quant_mode="quant").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))


def test_kd_train_step_with_int8_teacher():
    """The `train_kd.py --quant_teacher` composition: an int8-quantized
    teacher must drive the real KD train step (teacher forward -> voting ->
    OT loss -> student update) with finite losses and a KD term close to
    the BN-folded float teacher's on the same state/batch."""
    from kd6d_pose_adlp_tpu.config import (Config, KDConfig, ModelConfig,
                                           SolverConfig, TestConfig)
    from kd6d_pose_adlp_tpu.data.synthetic import SyntheticPoseDataset
    from kd6d_pose_adlp_tpu.engine.steps import (build_train_step,
                                                 create_train_state,
                                                 make_optimizer)

    res, n_fg = 64, 3
    cfg = Config(model=ModelConfig(backbone="darknet_tiny_h", input_res=res),
                 solver=SolverConfig(ims_per_batch=4, max_iter=50, max_objs=2,
                                     max_pos=32),
                 test=TestConfig(max_votes=16, ransac_iters=16),
                 kd=KDConfig(weight=5.0, max_teacher_cells=16))
    cfg_t = Config(model=ModelConfig(backbone="darknet_tiny", input_res=res,
                                     bn_folded=True),
                   solver=cfg.solver, test=cfg.test, kd=cfg.kd)
    ds = SyntheticPoseDataset(n_fg=n_fg, input_res=res, max_objs=2,
                              single_class=1, seed=7)
    consts = ds.consts()
    consts = consts._replace(kp3d=consts.kp3d[:n_fg],
                             diameters=consts.diameters[:n_fg])
    batch = ds.batch(range(4), train=True)

    tnet_f = PoseNet(cfg=cfg_t.model, n_fg=n_fg)
    raw = PoseNet(cfg=dataclasses.replace(cfg_t.model, bn_folded=False),
                  n_fg=n_fg).init(jax.random.PRNGKey(5),
                                  jnp.zeros((1, res, res, 3)))
    folded = fold_batchnorm(raw)
    tnet_q, tvars_q = quantize_posenet(cfg_t.model, n_fg, folded,
                                       [batch.images])
    cfg_tq = cfg_t.replace(model=dataclasses.replace(cfg_t.model,
                                                     quant_mode="quant"))

    net = PoseNet(cfg=cfg.model, n_fg=n_fg)
    opt = make_optimizer(cfg)
    metrics = {}
    for tag, (c_t, tn, tv) in {"folded": (cfg_t, tnet_f, folded),
                               "int8": (cfg_tq, tnet_q, tvars_q)}.items():
        state = create_train_state(jax.random.PRNGKey(0), cfg, net, opt)
        step = jax.jit(build_train_step(cfg, c_t, consts, net, tn, opt,
                                        distill=True))
        _, m = step(state, tv, batch, jax.random.PRNGKey(2))
        metrics[tag] = {k: float(v) for k, v in jax.device_get(m).items()}
        assert all(np.isfinite(v) for v in metrics[tag].values()), metrics[tag]
    # the non-KD losses see the same student/batch -> identical; the KD term
    # differs only through the teacher's int8 rounding
    np.testing.assert_allclose(metrics["int8"]["loss_cls"],
                               metrics["folded"]["loss_cls"], rtol=1e-5)
    assert (abs(metrics["int8"]["loss_kd"] - metrics["folded"]["loss_kd"])
            <= 0.25 * abs(metrics["folded"]["loss_kd"]) + 1e-3), metrics
