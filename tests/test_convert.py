"""Checkpoint converter tests.

Numerical parity of the layout transposes is checked against torch's
functional ops (torch used as an independent numeric oracle, not as a model
source); structural parity is checked by converting a synthetic state dict
with the reference's exact key naming and matching it against our model's
init tree."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _high_precision():
    # JAX's DEFAULT matmul/conv precision is reduced (bf16-style passes, the
    # TPU-native fast path). Parity checks against torch need full fp32.
    with jax.default_matmul_precision("highest"):
        yield

from yolo_tpu.convert import (
    _t_conv,
    _t_linear,
    _t_linear_from_flatten,
    convert_reference_state_dict,
    convert_torchvision_resnet50,
)


def test_conv_kernel_transpose_matches_torch():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)  # OIHW
    b = rng.normal(size=(8,)).astype(np.float32)
    x = rng.normal(size=(2, 3, 10, 10)).astype(np.float32)  # NCHW

    ref = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2, padding=1
    ).numpy()

    from yolo_tpu.models.layers import Conv

    conv = Conv(features=8, kernel_size=3, stride=2, padding=1)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = conv.init(jax.random.PRNGKey(0), x_nhwc)
    variables = jax.tree.map(lambda v: v, variables)
    variables["params"]["Conv_0"]["kernel"] = jnp.asarray(_t_conv(w))
    variables["params"]["Conv_0"]["bias"] = jnp.asarray(b)
    out = conv.apply(variables, x_nhwc)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


def test_maxpool_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 9, 9)).astype(np.float32)
    ref = torch.nn.functional.max_pool2d(
        torch.tensor(x), kernel_size=3, stride=2, padding=1
    ).numpy()
    from yolo_tpu.models.layers import max_pool

    out = max_pool(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 3, 2, 1)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-5, atol=1e-6
    )


def test_batchnorm_eval_matches_torch():
    rng = np.random.default_rng(2)
    c = 6
    x = rng.normal(size=(2, c, 5, 5)).astype(np.float32)
    weight = rng.normal(size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)
    mean = rng.normal(size=(c,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32)
    ref = torch.nn.functional.batch_norm(
        torch.tensor(x), torch.tensor(mean), torch.tensor(var),
        torch.tensor(weight), torch.tensor(bias), training=False, eps=1e-5,
    ).numpy()

    from yolo_tpu.models.layers import BatchNorm

    bn = BatchNorm()
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = bn.init(jax.random.PRNGKey(0), x_nhwc, False)
    variables = {
        "params": {"BatchNorm_0": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)}},
        "batch_stats": {"BatchNorm_0": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}},
    }
    out = bn.apply(variables, x_nhwc, False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


def test_linear_from_flatten_reindexes_nchw_to_nhwc():
    rng = np.random.default_rng(3)
    C, H, W, out_dim = 5, 3, 3, 7
    w = rng.normal(size=(out_dim, C * H * W)).astype(np.float32)
    b = rng.normal(size=(out_dim,)).astype(np.float32)
    feat = rng.normal(size=(2, C, H, W)).astype(np.float32)

    ref = torch.nn.functional.linear(
        torch.tensor(feat).flatten(1), torch.tensor(w), torch.tensor(b)
    ).numpy()

    kernel = _t_linear_from_flatten(w, (C, H, W))
    feat_nhwc = np.transpose(feat, (0, 2, 3, 1)).reshape(2, -1)
    ours = feat_nhwc @ kernel + b
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def _synth_resnet50_sd(prefix=""):
    """Synthetic torchvision-resnet50 state dict with correct names/shapes.

    Conv weights are He-scaled (std = sqrt(2/fan_in)) so a full 50-layer fp32
    forward stays finite — std-1 normals overflow fp32 after ~25 conv+BN
    layers, which is a property of the synthetic weights, not the converter.
    """
    sd = {}
    g = np.random.default_rng(0)

    def t(*shape):
        w = g.normal(size=shape).astype(np.float32)
        if len(shape) == 4:  # conv OIHW: He scaling over fan_in
            w *= np.sqrt(2.0 / (shape[1] * shape[2] * shape[3]))
        return torch.tensor(w)

    def bn(name, c):
        sd[f"{name}.weight"] = t(c)
        sd[f"{name}.bias"] = t(c)
        sd[f"{name}.running_mean"] = t(c)
        sd[f"{name}.running_var"] = torch.abs(t(c)) + 0.5
        sd[f"{name}.num_batches_tracked"] = torch.tensor(1)

    sd[f"{prefix}conv1.weight" if not prefix.endswith(".") else f"{prefix}0.weight"] = t(64, 3, 7, 7)
    bn(f"{prefix}bn1" if not prefix.endswith(".") else f"{prefix}1", 64)

    stage_sizes = [3, 4, 6, 3]
    inplanes = 64
    for s, blocks in enumerate(stage_sizes):
        planes = 64 * (2**s)
        lname = f"{prefix}layer{s + 1}" if not prefix.endswith(".") else f"{prefix}{4 + s}"
        for bidx in range(blocks):
            base = f"{lname}.{bidx}"
            sd[f"{base}.conv1.weight"] = t(planes, inplanes if bidx == 0 else planes * 4, 1, 1)
            bn(f"{base}.bn1", planes)
            sd[f"{base}.conv2.weight"] = t(planes, planes, 3, 3)
            bn(f"{base}.bn2", planes)
            sd[f"{base}.conv3.weight"] = t(planes * 4, planes, 1, 1)
            bn(f"{base}.bn3", planes * 4)
            if bidx == 0:
                sd[f"{base}.downsample.0.weight"] = t(
                    planes * 4, inplanes, 1, 1
                )
                bn(f"{base}.downsample.1", planes * 4)
        inplanes = planes * 4
    return sd


def _tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def test_resnet_backbone_structural_conversion():
    sd = _synth_resnet50_sd()
    converted = convert_torchvision_resnet50(sd)

    from yolo_tpu.models import ResNetBackbone

    model = ResNetBackbone()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False
    )
    exp_p = _tree_shapes(variables["params"])
    got_p = _tree_shapes(converted["params"])
    assert jax.tree.structure(exp_p) == jax.tree.structure(got_p), "param tree mismatch"
    assert exp_p == got_p
    exp_s = _tree_shapes(variables["batch_stats"])
    got_s = _tree_shapes(converted["batch_stats"])
    assert exp_s == got_s


def test_full_reference_model_conversion_and_forward():
    # Full reference-style state dict: backbone.extractor.* + head.*.
    sd = _synth_resnet50_sd(prefix="backbone.extractor.")
    g = np.random.default_rng(1)

    def t(*shape):
        return torch.tensor(g.normal(size=shape).astype(np.float32) * 0.01)

    chans = [(2048, 1024), (1024, 1024), (1024, 1024), (1024, 1024)]
    for idx, (cin, cout) in zip(("0", "2", "4", "6"), chans):
        sd[f"head.conv_layers.{idx}.weight"] = t(cout, cin, 3, 3)
        sd[f"head.conv_layers.{idx}.bias"] = t(cout)
    sd["head.fc_layers.1.weight"] = t(4096, 1024 * 7 * 7)
    sd["head.fc_layers.1.bias"] = t(4096)
    sd["head.fc_layers.4.weight"] = t(7 * 7 * 30, 4096)
    sd["head.fc_layers.4.bias"] = t(7 * 7 * 30)

    variables = convert_reference_state_dict(sd, backbone="resnet")

    from yolo_tpu.models import ResNetBackbone, YOLOv1

    model = YOLOv1(num_classes=20, S=7, B=2, backbone=ResNetBackbone())
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 448, 448, 3)), train=False
    )
    assert _tree_shapes(init_vars["params"]) == _tree_shapes(variables["params"])

    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.zeros((1, 448, 448, 3)),
        train=False,
    )
    assert out.shape == (1, 7, 7, 30)
    assert bool(jnp.all(jnp.isfinite(out)))
