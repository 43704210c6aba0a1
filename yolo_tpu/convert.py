"""PyTorch .pth checkpoint import: reference state dicts -> JAX pytrees.

Enables drop-in reuse of the reference's published checkpoints
(``yolo_best.pth`` on HF, reference README.md:62,130) and of torchvision
ResNet50 ImageNet weights for the pretrained backbone. Handles the layout
differences between the frameworks:

- conv kernels: torch OIHW -> flax HWIO transpose
- linear weights: torch (out, in) -> flax (in, out) transpose
- the first FC after flatten: torch flattens NCHW features (C, H, W order),
  this framework flattens NHWC (H, W, C) — the FC weight columns are
  re-indexed accordingly (reference head: src/yolo/models.py:326-332)
- BatchNorm: weight/bias -> scale/bias params; running_mean/var -> batch_stats

Requires torch only to unpickle the .pth (torch CPU is sufficient).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np


def _t_conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_linear(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(w, (1, 0))


def _t_linear_from_flatten(
    w: np.ndarray, feature_chw: Tuple[int, int, int]
) -> np.ndarray:
    """Re-index an FC weight whose input is a flattened feature map.

    torch columns are ordered (C, H, W); ours are (H, W, C).
    """
    out_dim = w.shape[0]
    c, h, wd = feature_chw
    w = w.reshape(out_dim, c, h, wd)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, c * h * wd)
    return _t_linear(w)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _to_numpy_state_dict(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for key, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        out[key] = np.asarray(value)
    return out


# --------------------------------------------------------------------- resnet
def _convert_resnet_layers(
    sd: Dict[str, np.ndarray],
    prefix: str,
    params: Dict,
    stats: Dict,
    dest_prefix: Tuple[str, ...],
    layer_name_of: Dict[str, str],
) -> None:
    """Convert torchvision-resnet-shaped keys under ``prefix``.

    ``layer_name_of`` maps the torch layer token (e.g. '4' for Sequential
    children, or 'layer1' for a bare resnet) to our stage name 'layer1'.
    """
    bn_re = re.compile(r"(weight|bias|running_mean|running_var)$")
    for key, value in sd.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix) :].split(".")
        # Stem.
        if rest[0] in layer_name_of and layer_name_of[rest[0]] == "conv1":
            _set(params, dest_prefix + ("conv1", "Conv_0", "kernel"), _t_conv(value))
            continue
        if rest[0] in layer_name_of and layer_name_of[rest[0]] == "bn1":
            _convert_bn(rest[1], value, params, stats, dest_prefix + ("bn1",))
            continue
        # Stages.
        stage = layer_name_of.get(rest[0])
        if stage is None or not stage.startswith("layer"):
            continue
        block = rest[1]
        module = rest[2]
        dest_block = dest_prefix + (f"{stage}_block{block}",)
        if module.startswith("conv"):
            _set(params, dest_block + (module, "Conv_0", "kernel"), _t_conv(value))
        elif module.startswith("bn"):
            _convert_bn(rest[3], value, params, stats, dest_block + (module,))
        elif module == "downsample":
            # downsample.0 = 1x1 conv, downsample.1 = bn (torchvision naming).
            if rest[3] == "0" and rest[4] == "weight":
                _set(
                    params,
                    dest_block + ("downsample_conv", "Conv_0", "kernel"),
                    _t_conv(value),
                )
            elif rest[3] == "1" and bn_re.match(rest[4]):
                _convert_bn(
                    rest[4], value, params, stats, dest_block + ("downsample_bn",)
                )


def _convert_bn(field: str, value, params: Dict, stats: Dict, dest: Tuple[str, ...]):
    dest = dest + ("BatchNorm_0",)
    if field == "weight":
        _set(params, dest + ("scale",), value)
    elif field == "bias":
        _set(params, dest + ("bias",), value)
    elif field == "running_mean":
        _set(stats, dest + ("mean",), value)
    elif field == "running_var":
        _set(stats, dest + ("var",), value)
    # num_batches_tracked is dropped (flax has no equivalent; momentum fixed).


_RESNET_CHILD_NAMES = {
    "0": "conv1",
    "1": "bn1",
    "4": "layer1",
    "5": "layer2",
    "6": "layer3",
    "7": "layer4",
}
_RESNET_BARE_NAMES = {
    "conv1": "conv1",
    "bn1": "bn1",
    "layer1": "layer1",
    "layer2": "layer2",
    "layer3": "layer3",
    "layer4": "layer4",
}


def convert_torchvision_resnet50(
    state_dict, dest_prefix: Tuple[str, ...] = ()
) -> Dict[str, Any]:
    """Convert a bare torchvision resnet50 state dict (ImageNet weights).

    Returns {'params': ..., 'batch_stats': ...} for ``ResNetBackbone``.
    """
    sd = _to_numpy_state_dict(state_dict)
    params: Dict = {}
    stats: Dict = {}
    _convert_resnet_layers(sd, "", params, stats, dest_prefix, _RESNET_BARE_NAMES)
    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------------------- full model
def convert_reference_state_dict(
    state_dict,
    backbone: str = "resnet",
    S: int = 7,
    B: int = 2,
    num_classes: int = 20,
) -> Dict[str, Any]:
    """Convert a reference YOLOv1 model state dict to our variables pytree.

    Supports both reference configurations:
    - 'resnet': ``backbone.extractor.{i}...`` + ``head.conv_layers/fc_layers``
      (reference models.py:162, 313-332)
    - 'yolov1': ``backbone.features.{i}.weight`` conv stack + simple
      ``head.{1,4}`` Linear head (reference models.py:47-84, 239-245)
    """
    sd = _to_numpy_state_dict(state_dict)
    params: Dict = {}
    stats: Dict = {}

    if backbone == "resnet":
        _convert_resnet_layers(
            sd,
            "backbone.extractor.",
            params,
            stats,
            ("backbone",),
            _RESNET_CHILD_NAMES,
        )
        # Head convs: conv_layers Sequential indices 0,2,4,6 -> conv1..conv4.
        conv_map = {"0": "conv1", "2": "conv2", "4": "conv3", "6": "conv4"}
        for idx, name in conv_map.items():
            _set(
                params,
                ("detection_head", name, "Conv_0", "kernel"),
                _t_conv(sd[f"head.conv_layers.{idx}.weight"]),
            )
            _set(
                params,
                ("detection_head", name, "Conv_0", "bias"),
                sd[f"head.conv_layers.{idx}.bias"],
            )
        _set(
            params,
            ("detection_head", "fc1", "Dense_0", "kernel"),
            _t_linear_from_flatten(sd["head.fc_layers.1.weight"], (1024, S, S)),
        )
        _set(params, ("detection_head", "fc1", "Dense_0", "bias"), sd["head.fc_layers.1.bias"])
        _set(
            params,
            ("detection_head", "fc2", "Dense_0", "kernel"),
            _t_linear(sd["head.fc_layers.4.weight"]),
        )
        _set(params, ("detection_head", "fc2", "Dense_0", "bias"), sd["head.fc_layers.4.bias"])

    elif backbone == "yolov1":
        conv_keys = sorted(
            (k for k in sd if re.fullmatch(r"backbone\.features\.\d+\.weight", k)),
            key=lambda k: int(k.split(".")[2]),
        )
        for order, key in enumerate(conv_keys):
            idx = key.split(".")[2]
            _set(
                params,
                ("backbone", f"Conv_{order}", "Conv_0", "kernel"),
                _t_conv(sd[key]),
            )
            _set(
                params,
                ("backbone", f"Conv_{order}", "Conv_0", "bias"),
                sd[f"backbone.features.{idx}.bias"],
            )
        _set(
            params,
            ("detection_head", "fc1", "Dense_0", "kernel"),
            _t_linear_from_flatten(sd["head.1.weight"], (1024, S, S)),
        )
        _set(params, ("detection_head", "fc1", "Dense_0", "bias"), sd["head.1.bias"])
        _set(
            params,
            ("detection_head", "fc2", "Dense_0", "kernel"),
            _t_linear(sd["head.4.weight"]),
        )
        _set(params, ("detection_head", "fc2", "Dense_0", "bias"), sd["head.4.bias"])
    else:
        raise ValueError(f"Unknown backbone '{backbone}'")

    return {"params": params, "batch_stats": stats}


def load_pth_checkpoint(
    path: str | Path,
    backbone: str = "resnet",
    S: int = 7,
    B: int = 2,
    num_classes: int = 20,
) -> Dict[str, Any]:
    """Load a reference .pth training checkpoint into our payload schema.

    Returns a dict shaped like yolo_tpu.training.checkpoints payloads (model
    state converted; optimizer state NOT convertible across frameworks).
    """
    import torch

    raw = torch.load(str(path), map_location="cpu", weights_only=False)
    state_dict = raw.get("model_state_dict", raw)
    variables = convert_reference_state_dict(
        state_dict, backbone=backbone, S=S, B=B, num_classes=num_classes
    )
    payload = {
        "version": 0,
        "epoch": raw.get("epoch", 0) if isinstance(raw, dict) else 0,
        "model_state_dict": {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        "optimizer_state_dict": None,
        "imported_from": str(path),
    }
    if isinstance(raw, dict):
        for key in ("train_loss", "val_loss", "mAP50:95", "mAP50", "mAP75"):
            if key in raw:
                payload[key] = raw[key]
    return payload
