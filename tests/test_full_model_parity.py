"""Full-network numerical parity: reference torch FPN/PoseHead + backbone vs
our converted Flax PoseNet — proves the whole architecture (incl. P6/P7
wiring and per-level scales) computes the same function."""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kd6d_pose_adlp_tpu.config import ModelConfig  # noqa: E402
from kd6d_pose_adlp_tpu.models.pose_net import PoseNet  # noqa: E402
from kd6d_pose_adlp_tpu.utils.torch_convert import (  # noqa: E402
    convert_pose_module, merge_into_variables)


def _stub(name, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def _import_reference_model():
    """Import reference models/model.py with its heavyweight optional deps
    stubbed out (trimesh/pyrender/transforms3d/geomloss are never touched by
    the forward pass)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("trimesh", "pyrender", "transforms3d", "transforms3d.euler",
                 "geomloss", "psutil", "tensorboardX"):
        _stub(name)
    sys.modules["transforms3d"].euler = sys.modules["transforms3d.euler"]
    # torchvision may be absent; libs.boxlist imports its nms lazily enough?
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = lambda *a, **k: None
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    import importlib
    return importlib.import_module("models.model")


@pytest.mark.parametrize("backbone", ["darknet_tiny_h", "darknet53"])
def test_full_network_parity(backbone):
    mm = _import_reference_model()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    bmod = importlib.import_module("backbone.darknet")
    bmod53 = importlib.import_module("backbone.darknet53")

    cfg = ModelConfig(backbone=backbone)
    n_fg = 15
    torch.manual_seed(0)

    if backbone == "darknet_tiny_h":
        ref_backbone = bmod.darknet_tiny_h(pretrained=False)
    else:
        ref_backbone = bmod53.darknet53(pretrained=False)
    fpn_top = mm.FPNTopP6P7(cfg.feat_channels[-1], cfg.out_channel)
    ref_fpn = mm.FPN(list(cfg.feat_channels), cfg.out_channel, fpn_top)
    ref_head = mm.PoseHead(cfg.out_channel, n_fg + 1, cfg.n_conv, cfg.prior,
                           "POINT")
    ref_backbone.eval(), ref_fpn.eval(), ref_head.eval()

    # reference forward (models/model.py:495-500)
    res = 128  # smaller than 256 to keep the CPU run fast; same strides
    x = np.random.default_rng(0).normal(size=(1, res, res, 3)).astype(np.float32)
    with torch.no_grad():
        feats = ref_backbone(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        pyr = ref_fpn(feats)
        logits_t, reg_t = ref_head(pyr)

    # assemble the reference-format state dict and convert
    sd = {}
    for k, v in ref_backbone.state_dict().items():
        sd[f"backbone.{k}"] = v.numpy()
    for k, v in ref_fpn.state_dict().items():
        sd[f"fpn.{k}"] = v.numpy()
    for k, v in ref_head.state_dict().items():
        sd[f"head.{k}"] = v.numpy()

    net = PoseNet(cfg=ModelConfig(backbone=backbone, input_res=res), n_fg=n_fg)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, stats = convert_pose_module(sd)
    variables = merge_into_variables(variables, params, stats)

    cls_f, reg_f = net.apply(variables, jnp.asarray(x), train=False)

    # flatten the torch per-level outputs the same way PoseNet does
    def flat(tensors, ch):
        outs = []
        for t in tensors:
            a = t.numpy().transpose(0, 2, 3, 1).reshape(1, -1, ch)
            outs.append(a)
        return np.concatenate(outs, axis=1)

    cls_ref = flat(logits_t, n_fg)
    reg_ref = flat(reg_t, n_fg * 16)
    assert cls_f.shape == cls_ref.shape, (cls_f.shape, cls_ref.shape)
    np.testing.assert_allclose(np.asarray(cls_f), cls_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(reg_f), reg_ref, rtol=5e-3, atol=5e-3)
