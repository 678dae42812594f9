"""Shared Flax building blocks.

TPU-first equivalents of the reference's vendored pytorchcv blocks
(`backbone/common.py:250-420`): Conv -> BatchNorm(eps 1e-5) -> activation.
NHWC layout throughout (TPU-native); convolutions run in `compute_dtype`
(bfloat16 on TPU for MXU throughput) with float32 parameters and float32
BatchNorm statistics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_uniform_ (a=0) == variance_scaling(2.0, fan_in, uniform)
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
# torch kaiming_uniform_ (a=1) == variance_scaling(1.0, fan_in, uniform)
kaiming_uniform_a1 = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def leaky_relu(x, alpha: float = 0.1):
    return nn.leaky_relu(x, negative_slope=alpha)


# BN statistics accumulation dtype knob (VERDICT r4 next #5a). True = f32
# accumulation from bf16 activations (flax force_float32_reductions; the
# numerically safe default). scripts/bench_bn_stats.py flips this to False
# to measure what the remaining bf16->f32 convert+reduce around the BN
# statistics (~2.3 ms of the 15.5 ms KD step, BASELINE.md profile) actually
# costs — bf16-accumulated means over ~1M-element feature maps lose
# mantissa, so this is a measurement knob, not a production switch.
BN_F32_STATS = True


class QConv(nn.Module):
    """Post-training-quantized int8 convolution (TPU MXU runs int8 matmuls at
    2x the bf16 peak on v5e). Two modes, selected by `mode`:

    - "calibrate": behaves exactly like the nn.Conv it replaces (same param
      names/init, so checkpoint trees line up) and additionally sows the
      running absmax of its input into the mutable 'quant_stats' collection.
      Run a few batches with apply(..., mutable=['quant_stats']) to collect
      per-conv activation ranges.
    - "quant": parameter-free. Reads int8 weights + scales from the 'quant'
      collection (built offline by utils/quant.build_quant_variables from the
      BN-folded f32 checkpoint + calibration stats): x is quantized per-tensor
      symmetric (scale = absmax/127), the conv accumulates int8*int8->int32 on
      the MXU, and the result is dequantized with the per-output-channel
      weight scale and biased in f32.

    Symmetric quantization maps 0 -> 0 exactly, so zero padding is exact.
    Used by ConvBNAct (folded backbones), FPN and the head towers.
    """
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: object = "SAME"
    mode: str = "calibrate"
    dtype: jnp.dtype = jnp.float32
    kernel_init: object = kaiming_uniform
    bias_init: object = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        ksz = (self.kernel_size, self.kernel_size)
        dn = ("NHWC", "HWIO", "NHWC")
        if self.mode == "quant":
            kshape = ksz + (x.shape[-1], self.features)
            kq = self.variable("quant", "kernel_q",
                               lambda: jnp.zeros(kshape, jnp.int8)).value
            w_scale = self.variable("quant", "w_scale",
                                    lambda: jnp.ones((self.features,), jnp.float32)).value
            bias = self.variable("quant", "bias",
                                 lambda: jnp.zeros((self.features,), jnp.float32)).value
            in_scale = self.variable("quant", "in_scale",
                                     lambda: jnp.ones((), jnp.float32)).value
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / in_scale),
                          -127, 127).astype(jnp.int8)
            pad = self.padding
            if pad == "SAME":
                # resolve to explicit SYMMETRIC padding at ANY stride:
                # lax's string 'SAME' pads end-only when strides > 1, which
                # would diverge from the torch-parity symmetric padding the
                # float/calibrate path uses (advisor r4 — latent
                # float-vs-int8 mismatch; callers currently pre-resolve
                # stride-2 pads so this branch only sees strides == 1)
                p = self.kernel_size // 2
                pad = ((p, p), (p, p))
            elif pad == "VALID":
                pad = ((0, 0), (0, 0))
            y = jax.lax.conv_general_dilated(
                xq, kq, (self.strides, self.strides), pad,
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    xq.shape, kq.shape, dn),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (in_scale * w_scale) + bias
            return y.astype(self.dtype)

        # calibrate: plain conv (nn.Conv-compatible params) + input-absmax sow
        self.sow("quant_stats", "in_amax",
                 jnp.max(jnp.abs(x)).astype(jnp.float32),
                 init_fn=lambda: jnp.zeros((), jnp.float32),
                 reduce_fn=jnp.maximum)
        return self._plain_conv(x)

    def _plain_conv(self, x):
        """nn.Conv-equivalent application with params created in THIS scope
        (so the param tree path is identical to the nn.Conv it replaces)."""
        kshape = (self.kernel_size, self.kernel_size, x.shape[-1], self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, (self.strides, self.strides), self.padding,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")))
        return y + bias.reshape((1,) * (y.ndim - 1) + (-1,))


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) -> BatchNorm(eps=1e-5) -> activation
    (reference backbone/common.py:250-330).

    `folded=True` builds the inference-equivalent fused form instead:
    Conv2d(bias=True) -> activation, with the BN affine+stats pre-folded
    into the conv weights (see utils/fold_bn.fold_batchnorm). Used for the
    frozen KD teacher: it removes the per-step BN normalize (and its
    bf16<->f32 convert traffic) from the hot path entirely."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    alpha: float = 0.1  # LeakyReLU slope; None-like sentinel via use_act
    use_act: bool = True
    folded: bool = False
    quant_mode: str = ""  # "" | "calibrate" | "quant" (int8 PTQ; needs folded)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch Conv2d(padding=1): symmetric. Equal to XLA SAME at stride 1,
        # but at stride 2 SAME pads asymmetrically (end-only) — use explicit
        # symmetric padding so downsampling windows match torch exactly.
        if self.kernel_size == 1:
            padding = "VALID"
        elif self.strides == 1:
            padding = "SAME"
        else:
            pad = self.kernel_size // 2
            padding = ((pad, pad), (pad, pad))
        if self.quant_mode:
            assert self.folded, "int8 PTQ runs on the BN-folded network"
            x = QConv(self.features, self.kernel_size, self.strides,
                      padding=padding, mode=self.quant_mode,
                      dtype=self.dtype, name="conv")(x)
            if self.use_act:
                x = leaky_relu(x, self.alpha)
            return x.astype(self.dtype)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=padding,
            use_bias=self.folded,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_uniform,
            name="conv",
        )(x)
        if self.folded:
            if self.use_act:
                x = leaky_relu(x, self.alpha)
            return x.astype(self.dtype)
        # BN arithmetic runs in compute dtype; flax keeps the mean/var
        # reductions and the running stats in float32 regardless
        # (force_float32_reductions=True default). Under bfloat16 this avoids
        # materializing an f32 copy of every activation — the round-2 profile
        # showed 2.3 ms/step of bf16<->f32 convert around the BN statistics.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch BatchNorm2d default momentum 0.1
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            force_float32_reductions=BN_F32_STATS,
            name="bn",
        )(x)
        if self.use_act:
            x = leaky_relu(x, self.alpha)
        return x.astype(self.dtype)


def max_pool_2x2(x):
    """2x2/stride-2 max pool (XLA windowed reduce; SelectAndScatter grad).

    Do NOT replace this with reshape+max: jnp.max's gradient SPLITS the
    cotangent equally among tied window elements, while SelectAndScatter
    routes it to one winner. In bf16, 2-5% of windows hold exact ties and
    the split-gradient variant measurably degrades training — an A/B bisect
    on the 10k-step synthetic baseline showed final reg loss 0.56 vs 0.37
    and ADI-0.1d 31.2 vs 51.6 with ONLY this op changed (outputs/ab/
    baseline_bisect_{a,b}, 2026-08-17). The 0.8 ms/step backward cost of
    the windowed form is the price of those 20 ADI points."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


@jax.custom_vjp
def max_pool_2x2_fast(x):
    """2x2/stride-2 max pool with SelectAndScatter SEMANTICS but an
    elementwise backward: the custom VJP routes the whole cotangent to the
    first maximal element of each window (same winner as XLA's
    SelectAndScatter scan order), computed as a one-hot from argmax — no
    scatter op in the gradient. Opt-in replacement for max_pool_2x2 where
    the 0.8 ms/step SelectAndScatter backward matters; equivalence locked
    by tests/test_blocks.py."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))


def _mp_fast_fwd(x):
    B, H, W, C = x.shape
    w = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 5, 2, 4)
    w = w.reshape(B, H // 2, W // 2, C, 4)
    idx = jnp.argmax(w, axis=-1).astype(jnp.int8)  # first max wins ties
    return w.max(axis=-1), idx


def _mp_fast_bwd(idx, g):
    B, H2, W2, C = idx.shape
    onehot = jax.nn.one_hot(idx.astype(jnp.int32), 4, dtype=g.dtype)
    gx = onehot * g[..., None]                     # (B,H/2,W/2,C,4)
    gx = gx.reshape(B, H2, W2, C, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return (gx.reshape(B, 2 * H2, 2 * W2, C),)


max_pool_2x2_fast.defvjp(_mp_fast_fwd, _mp_fast_bwd)


def count_params(params) -> int:
    import jax
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
