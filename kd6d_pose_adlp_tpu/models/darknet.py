"""DarkNet backbone family in Flax (NHWC, TPU-first).

Capability match for the reference's pytorchcv DarkNet
(`backbone/darknet.py:48-254`): staged conv blocks with LeakyReLU(0.1) and
2x2 max-pool between stages; `tiny` variants alternate 3x3/1x1 convolutions
(odd_pointwise). Forward returns 4 pyramid maps [/2, /4, /8, /16-with-stage5]
exactly like the reference's `DarkNet.forward` (`backbone/darknet.py:125-135`).

An optional ImageNet classifier head (1x1 conv to n_classes + global avg pool)
exists only so parameter counts can be checked against the reference's
self-test constants (darknet_tiny == 1,042,104 — `backbone/darknet.py:285`).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBNAct, max_pool_2x2

# channel plans (reference backbone/darknet.py:157-180)
DARKNET_CHANNELS = {
    "ref": ([[16], [32], [64], [128], [256], [512], [1024]], False),
    "tiny": ([[16], [32], [16, 128, 16, 128], [32, 256, 32, 256], [64, 512, 64, 512, 128]], True),
    "tiny-h": ([[8], [16], [8, 64, 8, 64], [16, 128, 16, 128], [32, 256, 32, 256, 64]], True),
    "19": ([[32], [64], [128, 64, 128], [256, 128, 256], [512, 256, 512, 256, 512],
            [1024, 512, 1024, 512, 1024]], False),
    # TPU experiment (SURVEY §7 "narrow stages vs 128-lane MXU"): tiny-h with
    # the early/pointwise widths padded up to >=32 channels. If the narrow
    # convs are lane-bound (padding is free wall-clock), this variant buys
    # capacity at zero cost; measured by scripts/run_perf_suite.py. Stage
    # OUTPUT channels feeding the FPN stay identical to tiny-h.
    "tiny-h-wide": ([[32], [32], [32, 64, 32, 64], [32, 128, 32, 128],
                     [32, 256, 32, 256, 64]], True),
}


class DarkNet(nn.Module):
    version: str = "tiny-h"
    alpha: float = 0.1
    include_head: bool = False
    n_classes: int = 1000
    folded: bool = False  # BN pre-folded into conv (frozen teacher path)
    quant_mode: str = ""  # int8 PTQ mode for ConvBNAct (see blocks.QConv)
    # space-to-depth stem (TPU experiment, SURVEY §7): rearrange the input
    # to half resolution x 4x channels before stage1 and skip the first
    # pool — pyramid shapes are unchanged, stage-1 FLOPs halve, and the
    # first conv sees 12 input channels instead of 3 (denser MXU lanes).
    # Invertible rearrangement: no information loss, but the learned stem
    # differs from the reference — opt-in, perf-measured variant only.
    s2d_stem: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels, odd_pointwise = DARKNET_CHANNELS[self.version]
        if self.s2d_stem:
            B, H, W, C = x.shape
            x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(B, H // 2, W // 2, 4 * C)
        outs = []
        for si, stage in enumerate(channels):
            for j, feats in enumerate(stage):
                # pointwise iff multi-unit stage and unit parity matches
                # odd_pointwise (reference backbone/darknet.py:88-92)
                pointwise = (len(stage) > 1) and not (((j + 1) % 2 == 1) ^ odd_pointwise)
                x = ConvBNAct(feats, kernel_size=1 if pointwise else 3,
                              alpha=self.alpha, dtype=self.dtype,
                              folded=self.folded, quant_mode=self.quant_mode,
                              name=f"stage{si + 1}_unit{j + 1}")(x, train=train)
            outs.append(x)
            if si != len(channels) - 1 and not (self.s2d_stem and si == 0):
                # s2d stem already put stage1 at /2: no pool after it
                x = max_pool_2x2(x)

        if self.include_head:
            logits = nn.Conv(self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             kernel_init=nn.initializers.normal(0.01),
                             name="final_conv")(x)
            return jnp.mean(logits, axis=(1, 2))

        # pyramid maps after each pool boundary: out_i = stage_i output pooled
        # into the next stage; the reference returns the tensors
        # [stage1, stage2, stage3, stage5] AFTER the trailing pools
        # (its stages embed the pool). Replicate: pool stage outputs 1..n-1.
        pyr = [o if (self.s2d_stem and i == 0) else max_pool_2x2(o)
               for i, o in enumerate(outs[:-1])] + [outs[-1]]
        # reference forward: out1..out3 = stages 1-3, out4 = stage5(stage4(.))
        return [pyr[0], pyr[1], pyr[2], pyr[4]]


def darknet_tiny(**kw) -> DarkNet:
    return DarkNet(version="tiny", **kw)


def darknet_tiny_h(**kw) -> DarkNet:
    return DarkNet(version="tiny-h", **kw)
