"""End-to-end rehearsal of scripts/ingest_reference.py on FABRICATED
artifacts (VERDICT r4 next #6): a make_bop_dataset tree + a random-init
reference-format .pth, so the real-LINEMOD ingestion one-liner stays
drill-ready under zero egress.

Fabrication mirrors tests/test_full_model_parity.py (live reference
modules, random init); the ingest run itself goes through the REAL CLI
path: convert -> save ckpt -> test.py BOP eval -> per-class table.
"""
import json
import os
import subprocess
import sys
import types

import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not available"),
]


def _stub(name, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def _import_reference_model():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("trimesh", "pyrender", "transforms3d", "transforms3d.euler",
                 "geomloss", "psutil", "tensorboardX"):
        _stub(name)
    sys.modules["transforms3d"].euler = sys.modules["transforms3d.euler"]
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


def _fabricate_reference_pth(path: str, n_fg: int = 15):
    """Random-init reference PoseModule state dict in the {'model': sd}
    layout the reference's train loop checkpoints (train_kd.py save)."""
    from kd6d_pose_adlp_tpu.config import ModelConfig

    mm = _import_reference_model()
    import importlib
    bmod = importlib.import_module("backbone.darknet")

    cfg = ModelConfig(backbone="darknet_tiny_h")
    torch.manual_seed(0)
    backbone = bmod.darknet_tiny_h(pretrained=False)
    fpn_top = mm.FPNTopP6P7(cfg.feat_channels[-1], cfg.out_channel)
    fpn = mm.FPN(list(cfg.feat_channels), cfg.out_channel, fpn_top)
    head = mm.PoseHead(cfg.out_channel, n_fg + 1, cfg.n_conv, cfg.prior,
                       "POINT")
    sd = {}
    for prefix, mod in (("backbone", backbone), ("fpn", fpn), ("head", head)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    torch.save({"model": sd}, path)
    return path


def test_ingest_reference_drill(tmp_path):
    data_root = tmp_path / "bop"
    # tiny fabricated LINEMOD-layout tree (8 train / 8 test, class 0)
    rc = subprocess.run(
        [sys.executable, "scripts/make_bop_dataset.py",
         "--out", str(data_root), "--n_train", "8", "--n_test", "8"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert rc.returncode == 0, rc.stdout + rc.stderr

    pth = _fabricate_reference_pth(str(tmp_path / "final.pth"))
    out_dir = tmp_path / "ingest"

    env = dict(os.environ, KD6D_CPU="1")
    rc = subprocess.run(
        [sys.executable, "scripts/ingest_reference.py",
         "--weight_file", pth,
         "--config_file", str(data_root / "config.yaml"),
         "--out", str(out_dir), "--cpu", "--ims_per_batch", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    assert rc.returncode == 0, rc.stdout[-3000:] + rc.stderr[-3000:]

    # converted checkpoint written, eval table printed, preds.json saved
    assert (out_dir / "converted.ckpt").exists()
    assert "ADI" in rc.stdout, rc.stdout[-2000:]
    preds = json.load(open(out_dir / "preds.json"))
    assert len(preds) == 8, sorted(preds)
