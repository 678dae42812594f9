"""Numerical parity: reference torch backbones -> converted Flax weights.

Builds the actual reference darknet modules (random torch init), converts the
state dict, and requires the Flax forward to match the torch forward — the
strongest possible architecture-parity check.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kd6d_pose_adlp_tpu.models.darknet import DarkNet  # noqa: E402
from kd6d_pose_adlp_tpu.models.darknet53 import DarkNet53  # noqa: E402
from kd6d_pose_adlp_tpu.utils.torch_convert import (  # noqa: E402
    convert_backbone, merge_into_variables)


def _ref_module(name):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    mod = importlib.import_module("backbone.darknet")
    mod53 = importlib.import_module("backbone.darknet53")
    return {"darknet_tiny_h": mod.darknet_tiny_h,
            "darknet_tiny": mod.darknet_tiny,
            "darknet53": mod53.darknet53}[name]


@pytest.mark.parametrize("name,ours", [
    ("darknet_tiny_h", lambda: DarkNet(version="tiny-h")),
    ("darknet_tiny", lambda: DarkNet(version="tiny")),
    ("darknet53", lambda: DarkNet53()),
])
def test_backbone_forward_parity(name, ours):
    torch.manual_seed(0)
    ref = _ref_module(name)(pretrained=False)
    ref.eval()
    sd = {k: v for k, v in ref.state_dict().items()}

    net = ours()
    x_nhwc = np.random.default_rng(0).normal(
        size=(1, 64, 64, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))
    params, stats = convert_backbone({k: v.numpy() for k, v in sd.items()})
    variables = merge_into_variables(variables, params, stats)

    outs_flax = net.apply(variables, jnp.asarray(x_nhwc), train=False)
    with torch.no_grad():
        outs_torch = ref(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))

    assert len(outs_flax) == len(outs_torch)
    for of, ot in zip(outs_flax, outs_torch):
        ot = ot.numpy().transpose(0, 2, 3, 1)
        assert of.shape == ot.shape, (of.shape, ot.shape)
        # tolerance: f32 accumulation noise across up to 53 conv layers
        np.testing.assert_allclose(np.asarray(of), ot, rtol=5e-3, atol=1e-3)


def test_imgclsmob_zip_ingestion_rehearsal(tmp_path):
    """Dress rehearsal for real imgclsmob ImageNet weights (none reachable
    under zero egress): fabricate a release zip in the exact layout
    (`{name}-{error}-{sha1}.pth` inside — reference
    backbone/model_store.py:560-587) from a reference torch module's state
    dict, ingest it via imgclsmob_to_backbone_ckpt, and check the resulting
    final.ckpt initializes a student backbone to the torch values."""
    import zipfile

    from kd6d_pose_adlp_tpu.config import ModelConfig
    from kd6d_pose_adlp_tpu.models.pose_net import PoseNet
    from kd6d_pose_adlp_tpu.utils.checkpoint import load_backbone_init
    from kd6d_pose_adlp_tpu.utils.torch_convert import (
        convert_backbone, imgclsmob_to_backbone_ckpt)

    torch.manual_seed(1)
    ref = _ref_module("darknet_tiny_h")(pretrained=False)
    pth = tmp_path / "darknet_tiny_h-2340-cdd2c0c9.pth"
    torch.save(ref.state_dict(), pth)
    zpath = tmp_path / "darknet_tiny_h-2340-cdd2c0c9.pth.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(pth, pth.name)

    ckpt = str(tmp_path / "imagenet_tiny_h.ckpt")
    n = imgclsmob_to_backbone_ckpt(str(zpath), "darknet_tiny_h", ckpt)
    assert n > 50

    # the ckpt must function as --backbone_init for a fresh student
    net = PoseNet(cfg=ModelConfig(backbone="darknet_tiny_h"), n_fg=15)
    fresh = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 256, 256, 3)))
    params, stats, n2 = load_backbone_init(
        ckpt, fresh["params"], fresh["batch_stats"])
    assert n2 > 50
    conv_params, conv_stats = convert_backbone(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    got = np.asarray(params["backbone"]["stage1_unit1"]["conv"]["kernel"])
    np.testing.assert_allclose(
        got, conv_params["stage1_unit1"]["conv"]["kernel"], atol=1e-6)
    got_m = np.asarray(stats["backbone"]["stage1_unit1"]["bn"]["mean"])
    np.testing.assert_allclose(
        got_m, conv_stats["stage1_unit1"]["bn"]["mean"], atol=1e-6)
