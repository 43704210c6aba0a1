"""Detection heads producing the (N, S, S, B*5+C) YOLO grid.

Two heads, matching the reference's backbone dispatch:
- ``SimpleHead``: Flatten -> 4096 -> S*S*(B*5+C) for the YOLOv1Backbone
  (reference: src/yolo/models.py:239-245).
- ``DetectionHead``: 4 convs (one stride-2, 14x14 -> 7x7) then the same FC
  stack, for the ResNet50 backbone (reference: src/yolo/models.py:279-348).

Both flatten NHWC features (H, W, C order) — the native TPU layout — whereas
torch flattens NCHW (C, H, W). ``yolo_tpu.convert`` permutes imported FC
weights accordingly, so converted checkpoints are bit-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from yolo_tpu.models.layers import Conv, Dense, leaky_relu


class SimpleHead(nn.Module):
    """Flatten -> Linear(4096) -> LeakyReLU -> Dropout(0.5) -> Linear(out)."""

    num_classes: int = 20
    S: int = 7
    B: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N = x.shape[0]
        x = x.reshape(N, -1)
        x = leaky_relu(Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        out_dim = self.S * self.S * (self.B * 5 + self.num_classes)
        x = Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class DetectionHead(nn.Module):
    """Conv tower (in -> 1024, one stride-2) + FC stack, reshaped to the grid.

    For ResNet50's (N, 14, 14, 2048) features this yields (N, S, S, B*5+C)
    with S=7, matching reference src/yolo/models.py:313-348.
    """

    num_classes: int = 20
    S: int = 7
    B: int = 2
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = lambda f, k, s=1, p=0, name=None: Conv(  # noqa: E731
            features=f, kernel_size=k, stride=s, padding=p, dtype=self.dtype,
            quantized=self.quantized, name=name,
        )
        x = leaky_relu(conv(1024, 3, 1, 1, name="conv1")(x))
        x = leaky_relu(conv(1024, 3, 2, 1, name="conv2")(x))
        x = leaky_relu(conv(1024, 3, 1, 1, name="conv3")(x))
        x = leaky_relu(conv(1024, 3, 1, 1, name="conv4")(x))

        N = x.shape[0]
        x = x.reshape(N, -1)
        x = leaky_relu(Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        out_dim = self.S * self.S * (self.B * 5 + self.num_classes)
        x = Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        return x.reshape(N, self.S, self.S, self.B * 5 + self.num_classes)
