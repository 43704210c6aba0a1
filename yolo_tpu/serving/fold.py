"""BatchNorm folding: flax variables -> flat eval-time serving parameters.

Every conv+BN pair in the ResNet50 backbone collapses to a single conv with
per-output-channel scaled weights and a bias (standard inference fold):

    BN(conv(x)) = (w * g) * x + (beta - mean * g),   g = gamma / sqrt(var+eps)

The head's convs/FCs carry real biases and no BN (reference
src/yolo/models.py:313-332), so they pass through unchanged. The result is a
plain nested dict ("folded params") consumed by ``folded_forward`` (the fp32
correctness anchor) and by ``yolo_tpu.serving.quant``/``engine`` (the int8
pipeline). Architecture mirrored: reference src/yolo/models.py:131-176
(ResNet50 trunk) + 279-348 (DetectionHead).
"""

from __future__ import annotations

import re
from typing import Dict

import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5  # torch default, matches models/layers.py BatchNorm


def _fold_conv_bn(kernel, bn_params, bn_stats):
    """(folded_kernel, folded_bias) for a bias-free conv followed by BN."""
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    mean = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    g = gamma / jnp.sqrt(var + BN_EPS)
    w = kernel.astype(jnp.float32) * g  # broadcast over trailing (out) axis
    b = beta - mean * g
    return w, b


def fold_flagship(variables: Dict) -> Dict:
    """Fold the flagship (ResNet50 + DetectionHead) variables for serving.

    Returns::

        {"stem": {"w", "b"},
         "layers": [[block, ...] x 4],   # block: conv1/conv2/conv3 {"w","b"},
                                         # "downsample": {"w","b"} | None
         "head": {"conv1".."conv4", "fc1", "fc2": {"w", "b"}}}
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    bb_p, bb_s = params["backbone"], stats["backbone"]

    def conv_kernel(tree, name):
        return tree[name]["Conv_0"]["kernel"]

    def bn(tree_p, tree_s, name):
        return tree_p[name]["BatchNorm_0"], tree_s[name]["BatchNorm_0"]

    out: Dict = {}
    w, b = _fold_conv_bn(conv_kernel(bb_p, "conv1"), *bn(bb_p, bb_s, "bn1"))
    out["stem"] = {"w": w, "b": b}

    block_names = sorted(
        (k for k in bb_p if re.fullmatch(r"layer\d+_block\d+", k)),
        key=lambda k: tuple(map(int, re.findall(r"\d+", k))),
    )
    layers: list = [[] for _ in range(4)]
    for name in block_names:
        stage, idx = (int(x) for x in re.findall(r"\d+", name))
        blk_p, blk_s = bb_p[name], bb_s[name]
        # NB: stride is derived positionally by consumers (stage > 1, block 0
        # -> 2) so the folded dict stays a pure array pytree (jit-safe).
        block = {}
        for ci in ("conv1", "conv2", "conv3"):
            w, b = _fold_conv_bn(
                conv_kernel(blk_p, ci), *bn(blk_p, blk_s, "bn" + ci[-1])
            )
            block[ci] = {"w": w, "b": b}
        if "downsample_conv" in blk_p:
            w, b = _fold_conv_bn(
                conv_kernel(blk_p, "downsample_conv"),
                *bn(blk_p, blk_s, "downsample_bn"),
            )
            block["downsample"] = {"w": w, "b": b}
        else:
            block["downsample"] = None
        layers[stage - 1].append(block)
    out["layers"] = layers

    head_p = params["detection_head"]
    head: Dict = {}
    for name in ("conv1", "conv2", "conv3", "conv4"):
        head[name] = {
            "w": head_p[name]["Conv_0"]["kernel"].astype(jnp.float32),
            "b": head_p[name]["Conv_0"]["bias"].astype(jnp.float32),
        }
    for name in ("fc1", "fc2"):
        head[name] = {
            "w": head_p[name]["Dense_0"]["kernel"].astype(jnp.float32),
            "b": head_p[name]["Dense_0"]["bias"].astype(jnp.float32),
        }
    out["head"] = head
    return out


# --------------------------------------------------------------- fp32 forward
def _conv(x, w, stride=1, pad=0, dtype=jnp.float32):
    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _max_pool(x, window, stride, pad):
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1),
        pads,
    )


def folded_forward(folded: Dict, images, dtype=jnp.float32, stats=None, S=7,
                   wino_points=()):
    """Eval forward on folded params; numerically equals model.apply(train=False).

    ``stats`` (optional dict) collects max-|activation| at every int8
    quantization point — the calibration hook used by serving.quant. Keys
    must match ``quant.ACT_POINTS``. ``wino_points`` names 3x3/s1 convs
    (e.g. "head_conv1", "l3b1_conv2") whose INPUT additionally gets (16,)
    per-tap Winograd maxima recorded under ``{name}_wtap``
    (serving.winograd.tap_maxima — the per-tap activation calibration)."""
    relu = jnp.maximum
    leaky = lambda v: jnp.where(v > 0, v, 0.1 * v)  # noqa: E731

    def record(name, v):
        if stats is not None:
            stats[name] = jnp.max(jnp.abs(v)).astype(jnp.float32)

    def record_wtap(name, v):
        if stats is not None and name in wino_points:
            from yolo_tpu.serving.winograd import tap_maxima

            stats[f"{name}_wtap"] = tap_maxima(v)

    x = images.astype(dtype)
    record("input", x)
    x = relu(_conv(x, folded["stem"]["w"], 2, 3, dtype) + folded["stem"]["b"], 0.0)
    x = _max_pool(x, 3, 2, 1)
    record("stem", x)

    for si, blocks in enumerate(folded["layers"]):
        for bi, blk in enumerate(blocks):
            tag = f"l{si + 1}b{bi}"
            stride = 2 if (si > 0 and bi == 0) else 1
            identity = x
            y = relu(_conv(x, blk["conv1"]["w"], 1, 0, dtype)
                     + blk["conv1"]["b"], 0.0)
            record(f"{tag}_y1", y)
            if stride == 1:
                record_wtap(f"{tag}_conv2", y)
            y = relu(_conv(y, blk["conv2"]["w"], stride, 1, dtype)
                     + blk["conv2"]["b"], 0.0)
            record(f"{tag}_y2", y)
            y = _conv(y, blk["conv3"]["w"], 1, 0, dtype) + blk["conv3"]["b"]
            if blk["downsample"] is not None:
                identity = (
                    _conv(x, blk["downsample"]["w"], stride, 0, dtype)
                    + blk["downsample"]["b"]
                )
                # Pre-add branch maximum: the int8 engine quantizes the
                # downsample branch at its OWN scale (engine._block_xla), so
                # calibration needs the branch's range, not just the sum's.
                record(f"{tag}_ds", identity)
            x = relu(y + identity.astype(y.dtype), 0.0)
            record(f"{tag}_out", x)

    head = folded["head"]
    record_wtap("head_conv1", x)
    x = leaky(_conv(x, head["conv1"]["w"], 1, 1, dtype) + head["conv1"]["b"])
    record("head_conv1", x)
    x = leaky(_conv(x, head["conv2"]["w"], 2, 1, dtype) + head["conv2"]["b"])
    record("head_conv2", x)
    record_wtap("head_conv3", x)
    x = leaky(_conv(x, head["conv3"]["w"], 1, 1, dtype) + head["conv3"]["b"])
    record("head_conv3", x)
    record_wtap("head_conv4", x)
    x = leaky(_conv(x, head["conv4"]["w"], 1, 1, dtype) + head["conv4"]["b"])
    record("head_conv4", x)

    n = x.shape[0]
    x = x.reshape(n, -1)
    x = leaky(
        jnp.dot(x.astype(dtype), head["fc1"]["w"].astype(dtype),
                preferred_element_type=jnp.float32) + head["fc1"]["b"]
    )
    x = (
        jnp.dot(x.astype(dtype), head["fc2"]["w"].astype(dtype),
                preferred_element_type=jnp.float32) + head["fc2"]["b"]
    )
    return x.reshape(n, S, S, -1)
