"""Feature-extractor backbones: the 24-conv YOLOv1 stack and ResNet50.

NHWC / HWIO throughout; bfloat16 compute optional via ``dtype``. The ResNet50
is implemented from the architecture definition (bottleneck v1.5, stride on the
3x3 conv — torchvision's variant, which the reference wraps at
src/yolo/models.py:131-176) rather than imported, so the whole forward is one
XLA program with no framework glue.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from yolo_tpu.models.layers import BatchNorm, Conv, leaky_relu, max_pool


class Backbone(nn.Module):
    """Abstract feature-extractor interface (reference: src/yolo/models.py:6-30).

    Subclasses produce NHWC feature maps from (N, H, W, 3) images.
    """

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError("Subclasses must implement __call__")


class YOLOv1Backbone(Backbone):
    """The original 24-conv YOLOv1 backbone (reference: src/yolo/models.py:33-128).

    448x448x3 -> (N, 7, 7, 1024): 7x7/s2 conv, maxpool, a 3x3 conv, maxpool,
    a 1x1/3x3 ladder, maxpool, 4x(1x1->3x3) + 1x1/3x3, maxpool, 2x(1x1->3x3),
    3x3, 3x3/s2, then two more 3x3 convs. LeakyReLU(0.1) after every conv.
    """

    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = lambda f, k, s=1, p=0: Conv(  # noqa: E731
            features=f, kernel_size=k, stride=s, padding=p, dtype=self.dtype,
            quantized=self.quantized,
        )
        # Stage 1: 448 -> 224 -> 112
        x = leaky_relu(conv(64, 7, 2, 3)(x))
        x = max_pool(x, 2, 2)
        # Stage 2: 112 -> 56
        x = leaky_relu(conv(192, 3, 1, 1)(x))
        x = max_pool(x, 2, 2)
        # Stage 3 (1x1/3x3 ladder): 56 -> 28
        x = leaky_relu(conv(128, 1)(x))
        x = leaky_relu(conv(256, 3, 1, 1)(x))
        x = leaky_relu(conv(256, 1)(x))
        x = leaky_relu(conv(512, 3, 1, 1)(x))
        x = max_pool(x, 2, 2)
        # Stage 4: 4x (1x1 256 -> 3x3 512), then 1x1 512 -> 3x3 1024: 28 -> 14
        for _ in range(4):
            x = leaky_relu(conv(256, 1)(x))
            x = leaky_relu(conv(512, 3, 1, 1)(x))
        x = leaky_relu(conv(512, 1)(x))
        x = leaky_relu(conv(1024, 3, 1, 1)(x))
        x = max_pool(x, 2, 2)
        # Stage 5: 2x (1x1 512 -> 3x3 1024), 3x3 1024, 3x3/s2 1024: 14 -> 7
        for _ in range(2):
            x = leaky_relu(conv(512, 1)(x))
            x = leaky_relu(conv(1024, 3, 1, 1)(x))
        x = leaky_relu(conv(1024, 3, 1, 1)(x))
        x = leaky_relu(conv(1024, 3, 2, 1)(x))
        # Stage 6: two 3x3 convs at 7x7
        x = leaky_relu(conv(1024, 3, 1, 1)(x))
        x = leaky_relu(conv(1024, 3, 1, 1)(x))
        return x


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck: 1x1 -> 3x3 (stride here) -> 1x1 x4, + shortcut."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    # False (production) | True/"stats" (Pallas stat reduction, XLA-fused
    # bwd) | "full" (whole-BN Pallas custom_vjp). BOTH Pallas modes measured
    # slower e2e than unfused XLA at b128/448² (480 / 337 vs 509 img/s —
    # PARITY.md "Fused-BN experiment"); kept as a tested reference
    # implementation, off by default. See ops/fused_bn.py.
    fused_bn: bool | str = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        q = self.quantized
        out = Conv(self.planes, 1, use_bias=False, dtype=self.dtype,
                   quantized=q, name="conv1")(x)
        if self.fused_bn:
            from yolo_tpu.models.layers import FusedBatchNormAct

            mode = "full" if self.fused_bn == "full" else "stats"
            bn = lambda name, relu=True: FusedBatchNormAct(  # noqa: E731
                relu=relu, dtype=self.dtype, mode=mode, name=name
            )
            out = bn("bn1")(out, train)
            out = Conv(
                self.planes, 3, self.stride, 1, use_bias=False,
                dtype=self.dtype, quantized=q, name="conv2",
            )(out)
            out = bn("bn2")(out, train)
            out = Conv(
                self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                quantized=q, name="conv3",
            )(out)
            if self.downsample:
                identity = Conv(
                    self.planes * 4, 1, self.stride, use_bias=False,
                    dtype=self.dtype, quantized=q, name="downsample_conv",
                )(x)
                identity = bn("downsample_bn", relu=False)(identity, train)
            return bn("bn3")(out, train, residual=identity)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(
            self.planes, 3, self.stride, 1, use_bias=False, dtype=self.dtype,
            quantized=q, name="conv2",
        )(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = Conv(
            self.planes * 4, 1, use_bias=False, dtype=self.dtype, quantized=q,
            name="conv3",
        )(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, train)
        if self.downsample:
            identity = Conv(
                self.planes * 4, 1, self.stride, use_bias=False, dtype=self.dtype,
                quantized=q, name="downsample_conv",
            )(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, train
            )
        return nn.relu(out + identity)


class ResNetBackbone(Backbone):
    """ResNet50 feature extractor for transfer learning.

    Mirrors the reference's torchvision-resnet50-minus-avgpool/fc wrapper
    (src/yolo/models.py:131-176): stem conv 7x7/s2 + BN + ReLU + maxpool 3x3/s2,
    bottleneck stages [3, 4, 6, 3], output (N, 14, 14, 2048) for 448x448 input.

    ``pretrained``/``freeze`` parity: weight loading happens via
    ``yolo_tpu.convert`` (there is no torchvision here); freezing is an
    optimizer-partition concern (``yolo_tpu.training.optim.freeze_labels``),
    matching torch's requires_grad=False semantics where BN running stats still
    update in train mode.
    """

    dtype: jnp.dtype = jnp.float32
    stage_sizes: tuple = (3, 4, 6, 3)
    quantized: bool = False
    # Rematerialisation granularity for the backward pass:
    #   False/"none"  — store all activations (fastest, most memory)
    #   True/"block"  — recompute inside each bottleneck (~30% extra FLOPs),
    #                   but each block's 112^2 INPUT is still stored, which is
    #                   why b256@448^2 used to OOM (PARITY.md).
    #   "stage"       — checkpoint only the 4 stage boundaries: the backward
    #                   pass re-runs a whole stage from its (much smaller or
    #                   at-least-once-needed) input, freeing every per-block
    #                   112^2/56^2 tensor for large-batch training.
    remat: bool | str = False
    # Pallas BN train path (ops/fused_bn.py): True/"stats" computes batch
    # statistics in a Pallas kernel (backward stays XLA-fused); "full" runs
    # the whole BN(+residual)+ReLU through Pallas custom_vjp kernels. Both
    # measured SLOWER e2e than unfused XLA at flagship scale (PARITY.md
    # "Fused-BN experiment") — off by default, kept as a tested reference.
    fused_bn: bool | str = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv(64, 7, 2, 3, use_bias=False, dtype=self.dtype,
                 quantized=self.quantized, name="conv1")(x)
        if self.fused_bn:
            from yolo_tpu.models.layers import FusedBatchNormAct

            x = FusedBatchNormAct(
                dtype=self.dtype,
                mode="full" if self.fused_bn == "full" else "stats",
                name="bn1",
            )(x, train)
        else:
            x = BatchNorm(dtype=self.dtype, name="bn1")(x, train)
            x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)
        mode = (
            self.remat
            if isinstance(self.remat, str)
            else ("block" if self.remat else "none")
        )
        # static_argnums: ``train`` (and the stage config ints) are Python
        # values consumed in control flow, not traced arrays.
        block_cls = (
            nn.remat(Bottleneck, static_argnums=(2,))
            if mode == "block"
            else Bottleneck
        )

        def run_stage(mdl, x, stage, num_blocks, train):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for block in range(num_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if block == 0 else 1,
                    downsample=block == 0,
                    dtype=mdl.dtype,
                    quantized=mdl.quantized,
                    fused_bn=mdl.fused_bn,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train)
            return x

        stage_fn = (
            nn.remat(run_stage, static_argnums=(2, 3, 4))
            if mode == "stage"
            else run_stage
        )
        for stage, num_blocks in enumerate(self.stage_sizes):
            x = stage_fn(self, x, stage, num_blocks, train)
        return x
