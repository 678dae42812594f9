"""DarkNet-53 backbone in Flax (NHWC, TPU-first).

Capability match for the reference (`backbone/darknet53.py:20-161`): 3x3 init
block (32ch) + 5 stages of [stride-2 3x3 conv, then residual DarkUnits
(1x1 -> 3x3, skip)], layers [2,3,9,9,5], channels [64,128,256,512,1024],
LeakyReLU(0.1). Forward returns the 5 stage outputs [/2,/4,/8,/16,/32].
Parameter parity target (with ImageNet linear head): 41,609,928
(`backbone/darknet53.py:242`).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBNAct

LAYERS = (2, 3, 9, 9, 5)
CHANNELS = (64, 128, 256, 512, 1024)


class DarkUnit(nn.Module):
    features: int
    alpha: float = 0.1
    folded: bool = False
    quant_mode: str = ""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        x = ConvBNAct(self.features // 2, kernel_size=1, alpha=self.alpha,
                      dtype=self.dtype, folded=self.folded,
                      quant_mode=self.quant_mode, name="conv1")(x, train=train)
        x = ConvBNAct(self.features, kernel_size=3, alpha=self.alpha,
                      dtype=self.dtype, folded=self.folded,
                      quant_mode=self.quant_mode, name="conv2")(x, train=train)
        return x + identity


class DarkNet53(nn.Module):
    alpha: float = 0.1
    include_head: bool = False
    n_classes: int = 1000
    folded: bool = False  # BN pre-folded into conv (frozen teacher path)
    quant_mode: str = ""  # int8 PTQ mode for ConvBNAct (see blocks.QConv)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(32, kernel_size=3, alpha=self.alpha, dtype=self.dtype,
                      folded=self.folded, quant_mode=self.quant_mode,
                      name="init_block")(x, train=train)
        outs = []
        for si, (n_units, feats) in enumerate(zip(LAYERS, CHANNELS)):
            x = ConvBNAct(feats, kernel_size=3, strides=2, alpha=self.alpha,
                          dtype=self.dtype, folded=self.folded,
                          quant_mode=self.quant_mode,
                          name=f"stage{si + 1}_unit1")(x, train=train)
            for j in range(n_units - 1):
                x = DarkUnit(feats, alpha=self.alpha, dtype=self.dtype,
                             folded=self.folded, quant_mode=self.quant_mode,
                             name=f"stage{si + 1}_unit{j + 2}")(x, train=train)
            outs.append(x)
        if self.include_head:
            pooled = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.n_classes, dtype=self.dtype,
                            param_dtype=jnp.float32, name="output")(pooled)
        return outs


def darknet53(**kw) -> DarkNet53:
    return DarkNet53(**kw)
