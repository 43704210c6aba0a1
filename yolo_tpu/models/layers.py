"""Shared layer helpers: torch-compatible initializers and conv/pool wrappers.

TPU-first choices:
- NHWC activations and HWIO kernels (XLA's native TPU conv layout).
- Explicit symmetric padding to match the reference's PyTorch conv arithmetic
  exactly (torch pads (p, p); XLA 'SAME' can pad asymmetrically).
- Optional compute dtype (bfloat16) with fp32 parameters, so the MXU runs in
  bf16 while optimizer state stays full precision.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from jax.nn.initializers import variance_scaling

# PyTorch's default Conv2d/Linear init is kaiming_uniform(a=sqrt(5)), which is
# exactly uniform(+-sqrt(1/fan_in)) = variance_scaling(1/3, fan_in, uniform).
# Using it keeps from-scratch training dynamics comparable to the reference.
torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(kernel_fan_in: int) -> Callable:
    """PyTorch default bias init: uniform(+-1/sqrt(fan_in)) of the kernel."""
    bound = 1.0 / (kernel_fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """Conv2d with torch-style symmetric padding and optional LeakyReLU(0.1).

    Matches reference conv blocks (e.g. src/yolo/models.py:47-84) in padding
    arithmetic; runs NHWC x HWIO on the MXU.

    ``quantized=True`` switches the compute path to dynamic int8 post-training
    quantization for inference: per-output-channel symmetric weight scales and
    a per-tensor dynamic activation scale, int8 x int8 -> int32 on the MXU
    (2x the bf16 peak on v5e), dequantized in the epilogue. The parameter
    tree is unchanged — trained fp32 checkpoints work as-is.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size * self.kernel_size
        if self.quantized:
            # Same "Conv_0" scope as nn.Conv so fp32 checkpoints load as-is.
            return _Int8ConvCore(
                features=self.features,
                kernel_size=self.kernel_size,
                stride=self.stride,
                padding=self.padding,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        y = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return y


class _Int8ConvCore(nn.Module):
    """Dynamic-int8 conv core: parameters named like ``nn.Conv`` (kernel/bias).

    Weights: symmetric per-output-channel scales (max|W|/127, the standard
    PTQ recipe). Activations: one dynamic per-tensor scale per call — no
    calibration pass needed, and the reduction is a single fused pass over
    the activations. The conv itself runs int8 x int8 -> int32 on the MXU.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size * self.kernel_size
        kernel = self.param(
            "kernel",
            torch_kernel_init,
            (self.kernel_size, self.kernel_size, in_features, self.features),
            jnp.float32,
        )
        s_w = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0, 1e-8
        )  # (features,)
        w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)

        s_x = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-8)
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_x), -127, 127
        ).astype(jnp.int8)

        y = lax.conv_general_dilated(
            x_q,
            w_q,
            (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_x * s_w)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,),
                              jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    """LeakyReLU with the reference's 0.1 negative slope (models.py passim)."""
    return nn.leaky_relu(x, negative_slope=0.1)


def max_pool(
    x: jnp.ndarray, window: int, stride: int, padding: int = 0
) -> jnp.ndarray:
    """Max pool with torch-style symmetric padding (pads with -inf)."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


class Dense(nn.Module):
    """Linear layer with torch-default init and fp32 params."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class FusedBatchNormAct(nn.Module):
    """BatchNorm(+residual)+ReLU backed by the Pallas kernels in
    ops/fused_bn.py for the train path.

    Parameter/collection layout is IDENTICAL to ``BatchNorm`` (params
    scale/bias, batch_stats mean/var, torch defaults eps 1e-5 / linen
    momentum 0.9), so checkpoints are interchangeable with the unfused
    modules — ``fused_bn`` is a runtime performance switch, not a model
    change. Eval mode uses plain XLA elementwise math (running stats are
    per-channel constants; XLA fuses that chain fine — only the train-mode
    batch-stat/backward reductions carry any slack, and per-iter it is a
    modest ~1.3-1.6x over their bandwidth floors, tools/profile_layers.py
    --train; see PARITY.md "Fused-BN experiment").
    """

    relu: bool = True
    dtype: jnp.dtype = jnp.float32
    # Both modes measured slower e2e than unfused XLA at b128/448²
    # (PARITY.md "Fused-BN experiment") — this module is opt-in only.
    mode: str = "stats"  # "stats" (Pallas stats only) | "full" (custom_vjp)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 residual: jnp.ndarray | None = None) -> jnp.ndarray:
        # Same checkpoint path as the unfused ``BatchNorm`` wrapper (whose
        # inner nn.BatchNorm lands at <name>/BatchNorm_0/...).
        return _FusedBNCore(
            relu=self.relu, dtype=self.dtype, mode=self.mode,
            name="BatchNorm_0",
        )(x, train, residual)


class _FusedBNCore(nn.Module):
    relu: bool
    dtype: jnp.dtype
    mode: str = "stats"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 residual: jnp.ndarray | None = None) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train and not self.is_initializing():
            if self.mode == "stats":
                # Pallas stat reduction only: strips the reduce epilogue
                # off the producing conv while the normalize and the WHOLE
                # backward stay XLA-fused (the jnp custom-VJP of the stats
                # fuses into the BN backward chain). Measured slower e2e
                # than unfused — see ops/fused_bn.py OUTCOME.
                from yolo_tpu.ops.fused_bn import bn_stats_diff

                mean, var = bn_stats_diff(x)
                mul = lax.rsqrt(var + 1e-5) * scale
                y = ((x.astype(jnp.float32) - mean) * mul + bias).astype(
                    self.dtype
                )
                if residual is not None:
                    y = y + residual
                out = nn.relu(y) if self.relu else y
            else:
                from yolo_tpu.ops.fused_bn import fused_bn_act

                out, mean, var = fused_bn_act(
                    x, scale, bias, residual=residual, relu=self.relu
                )
            ra_mean.value = (
                0.9 * ra_mean.value + 0.1 * lax.stop_gradient(mean)
            )
            ra_var.value = (
                0.9 * ra_var.value + 0.1 * lax.stop_gradient(var)
            )
            return out
        # Eval (and the shape-only init trace): running-stat normalize, in
        # flax.linen.BatchNorm's exact op order (f32 math, cast to dtype).
        mul = lax.rsqrt(ra_var.value + 1e-5) * scale
        y = ((x.astype(jnp.float32) - ra_mean.value) * mul + bias).astype(
            self.dtype
        )
        if residual is not None:
            y = y + residual
        return nn.relu(y) if self.relu else y


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1).

    linen's running-average momentum is (1 - torch_momentum) = 0.9. Running
    stats live in the ``batch_stats`` collection and update only when
    ``use_running_average=False`` — mirroring torch's train/eval split, where
    even a frozen (requires_grad=False) backbone still updates BN stats in
    train mode (reference freeze semantics: src/yolo/models.py:156-158).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
