"""Full dense pose network: backbone -> FPN -> head -> flat per-cell outputs.

TPU-first re-design of the reference `PoseModule` (`models/model.py:455-513`):
instead of per-level NCHW tensors + per-image BoxList anchors, the network
emits a single fixed-shape (B, A, C) tensor pair whose cell ordering matches
the static anchor table (`anchors.make_anchors`) — levels concatenated,
row-major within a level. Everything downstream (losses, postprocess, KD)
operates on these flat tensors with no Python loops.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .darknet import DarkNet
from .darknet53 import DarkNet53
from .fpn import FPN
from .head import PoseHead


def make_backbone(cfg: ModelConfig, dtype=jnp.float32, name: str = "backbone"):
    folded = getattr(cfg, "bn_folded", False)
    qm = getattr(cfg, "quant_mode", "")
    if cfg.backbone == "darknet53":
        return DarkNet53(dtype=dtype, folded=folded, quant_mode=qm, name=name)
    if cfg.backbone == "darknet_tiny":
        return DarkNet(version="tiny", dtype=dtype, folded=folded,
                       quant_mode=qm, name=name)
    if cfg.backbone == "darknet_tiny_h":
        return DarkNet(version="tiny-h", dtype=dtype, folded=folded,
                       quant_mode=qm, name=name)
    if cfg.backbone == "darknet_tiny_h_wide":
        return DarkNet(version="tiny-h-wide", dtype=dtype, folded=folded,
                       quant_mode=qm, name=name)
    if cfg.backbone == "darknet_tiny_h_s2d":
        return DarkNet(version="tiny-h", s2d_stem=True, dtype=dtype,
                       folded=folded, quant_mode=qm, name=name)
    raise ValueError(f"Unsupported backbone {cfg.backbone}")


class PoseNet(nn.Module):
    cfg: ModelConfig
    n_fg: int = 15

    @nn.compact
    def __call__(self, images, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images (B, H, W, 3) -> (cls (B, A, n_fg), reg (B, A, n_fg*16)), f32.

        uint8 input = raw BGR crops (the BOP host pipeline ships these —
        4x less host->device traffic than normalized f32); the ImageNet
        normalize then runs on device in f32 and fuses into the stem conv.
        float input is assumed already normalized RGB (synthetic pools)."""
        if images.dtype == jnp.uint8:
            from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
            x = images[..., ::-1].astype(jnp.float32)
            images = (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone = make_backbone(self.cfg, dtype=dtype, name="backbone")
        feats = backbone(images.astype(dtype), train=train)
        fpn = FPN(in_channels=self.cfg.feat_channels, out_channel=self.cfg.out_channel,
                  use_p6p7=self.cfg.use_higher_levels,
                  quant_mode=getattr(self.cfg, "quant_mode", ""),
                  dtype=dtype, name="fpn")
        pyramid = fpn(feats)
        assert len(pyramid) == self.cfg.num_levels
        code_bits = getattr(self.cfg, "code_bits", 0)
        head = PoseHead(n_fg=self.n_fg, n_conv=self.cfg.n_conv, prior=self.cfg.prior,
                        n_levels=max(5, self.cfg.num_levels),
                        quant_mode=getattr(self.cfg, "quant_mode", ""),
                        code_bits=code_bits, dtype=dtype, name="head")
        out = head(pyramid)
        logits, pose_reg = out[0], out[1]

        B = images.shape[0]
        flat_cls = jnp.concatenate(
            [l.reshape(B, -1, self.n_fg) for l in logits], axis=1)
        flat_reg = jnp.concatenate(
            [r.reshape(B, -1, self.n_fg * 16) for r in pose_reg], axis=1)
        assert flat_cls.shape[1] == self.cfg.num_cells, (
            flat_cls.shape, self.cfg.num_cells)
        if code_bits > 0:
            flat_code = jnp.concatenate(
                [c.reshape(B, -1, self.n_fg * (code_bits + 2))
                 for c in out[2]], axis=1)
            return (flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32),
                    flat_code.astype(jnp.float32))
        return flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32)
