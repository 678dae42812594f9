"""FPN + P6/P7 top block in Flax (reference models/model.py:40-103).

Lateral 1x1 + output 3x3 per non-skipped backbone level, nearest-neighbor 2x
top-down upsampling; P6/P7 = stride-2 3x3 convs from P_top (with ReLU between).
Kaiming-uniform(a=1) init matches `init_conv_kaiming` (models/model.py:24-29).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import kaiming_uniform_a1


def _upsample2x_nearest(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class FPN(nn.Module):
    in_channels: Sequence[int]  # zeros mark skipped backbone levels
    out_channel: int
    use_p6p7: bool = True
    quant_mode: str = ""  # int8 PTQ mode (see blocks.QConv)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        if self.quant_mode:
            from .blocks import QConv
            conv = lambda k, name: QConv(
                self.out_channel, k, padding="SAME", mode=self.quant_mode,
                dtype=self.dtype, kernel_init=kaiming_uniform_a1, name=name)
        else:
            conv = lambda k, name: nn.Conv(
                self.out_channel, (k, k), padding="SAME", use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=kaiming_uniform_a1, name=name)

        used = [i for i, c in enumerate(self.in_channels) if c > 0]
        assert len(used) >= 1
        # top-down pass (reference models/model.py:64-77)
        top = used[-1]
        inner = conv(1, f"inner{top}")(inputs[top])
        outs = [conv(3, f"out{top}")(inner)]
        for i in reversed(used[:-1]):
            up = _upsample2x_nearest(inner)
            inner = conv(1, f"inner{i}")(inputs[i]) + up
            outs.insert(0, conv(3, f"out{i}")(inner))

        if self.use_p6p7:
            # symmetric padding to match torch Conv2d(stride=2, padding=1).
            # NOTE: the reference's P6 consumes the RAW backbone top feature,
            # not the FPN P5 output — FPNTopP6P7(use_p5=True) is called as
            # top_blocks(outs[-1], inputs[-1]) and selects its SECOND arg
            # (models/model.py:80,97-103), whose channel count is
            # feat_channels[-1] (models/model.py:480).
            if self.quant_mode:
                from .blocks import QConv
                conv2 = lambda name: QConv(
                    self.out_channel, 3, strides=2, padding=((1, 1), (1, 1)),
                    mode=self.quant_mode, dtype=self.dtype,
                    kernel_init=kaiming_uniform_a1, name=name)
            else:
                conv2 = lambda name: nn.Conv(
                    self.out_channel, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=kaiming_uniform_a1,
                    name=name)
            p6 = conv2("p6")(inputs[used[-1]])
            p7 = conv2("p7")(nn.relu(p6))
            outs.extend([p6, p7])
        return outs
