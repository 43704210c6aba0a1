"""Model shape/NaN/gradient tests, mirroring reference tests/test_backbone.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.models import (
    Backbone,
    DetectionHead,
    ResNetBackbone,
    SimpleHead,
    YOLOv1,
    YOLOv1Backbone,
)
from yolo_tpu.ops.loss import yolo_loss


def test_backbone_abc_raises():
    with pytest.raises(NotImplementedError):
        Backbone().apply({}, jnp.zeros((1, 8, 8, 3)))


def test_yolov1_backbone_output_shape():
    model = YOLOv1Backbone()
    x = jnp.zeros((2, 448, 448, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 7, 7, 1024)
    assert not bool(jnp.any(jnp.isnan(out)))


def test_resnet_backbone_output_shape():
    model = ResNetBackbone()
    x = jnp.zeros((2, 448, 448, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 14, 14, 2048)
    assert not bool(jnp.any(jnp.isnan(out)))
    assert "batch_stats" in variables


def test_yolov1_default_full_model():
    model = YOLOv1(num_classes=20, S=7, B=2)
    x = jnp.zeros((1, 448, 448, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 7, 7, 30)


def test_yolov1_resnet_full_model():
    model = YOLOv1(num_classes=20, S=7, B=2, backbone=ResNetBackbone())
    x = jnp.zeros((1, 448, 448, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 7, 7, 30)
    assert not bool(jnp.any(jnp.isnan(out)))


def test_custom_backbone_requires_head():
    class Custom(Backbone):
        def __call__(self, x, train=False):
            return x

    model = YOLOv1(backbone=Custom())
    with pytest.raises(ValueError, match="custom backbone"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 448, 448, 3)), train=False)


def test_custom_backbone_with_head():
    class Custom(Backbone):
        def __call__(self, x, train=False):
            # Downsample to 14x14x2048-ish features cheaply.
            return jnp.zeros((x.shape[0], 14, 14, 8), x.dtype)

    model = YOLOv1(backbone=Custom(), detection_head=DetectionHead())
    out = model.apply(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 448, 448, 3)), train=False),
        jnp.zeros((1, 448, 448, 3)),
        train=False,
    )
    assert out.shape == (1, 7, 7, 30)


@pytest.mark.parametrize("num_classes,S,B", [(3, 7, 2), (20, 7, 3), (10, 5, 2)])
def test_head_parametric_shapes(num_classes, S, B):
    # DetectionHead alone on ResNet-like features (spatial 2*S -> S).
    head = DetectionHead(num_classes=num_classes, S=S, B=B)
    x = jnp.zeros((2, 2 * S, 2 * S, 32))
    out = head.apply(head.init(jax.random.PRNGKey(0), x, train=False), x, train=False)
    assert out.shape == (2, S, S, B * 5 + num_classes)


def test_simple_head_shape():
    head = SimpleHead(num_classes=20, S=7, B=2)
    x = jnp.zeros((2, 7, 7, 64))
    out = head.apply(head.init(jax.random.PRNGKey(0), x, train=False), x, train=False)
    assert out.shape == (2, 7 * 7 * 30)


def test_gradient_flow_through_full_model():
    model = YOLOv1(num_classes=3, S=2, B=2, backbone=ResNetBackbone())
    x = jnp.ones((1, 64, 64, 3)) * 0.1
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    target = jnp.zeros((1, 2, 2, 13))

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=False,
        )
        return yolo_loss(out, target, S=2, B=2, C=3)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).sum()) > 0 for g in flat)


def test_dropout_train_vs_eval():
    head = SimpleHead(num_classes=3, S=2, B=2)
    x = jnp.ones((1, 2, 2, 8))
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    eval_out = head.apply(variables, x, train=False)
    train_out = head.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))


def test_quantized_int8_path_matches_fp():
    """Dynamic-int8 inference variant: identical param tree, close outputs.

    The quantized model reuses fp32 checkpoints as-is (per-output-channel
    weight scales + per-tensor dynamic activation scales are derived in-graph;
    yolo_tpu/models/layers.py:_Int8ConvCore).
    """
    fp = YOLOv1(num_classes=20, S=7, B=2, backbone=ResNetBackbone())
    q = YOLOv1(
        num_classes=20,
        S=7,
        B=2,
        backbone=ResNetBackbone(quantized=True),
        quantized=True,
    )
    x = jnp.ones((1, 64, 64, 3)) * 0.05
    variables = fp.init(jax.random.PRNGKey(0), x, train=False)
    qvars = q.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        qvars
    )

    out_fp = np.asarray(fp.apply(variables, x, train=False))
    out_q = np.asarray(q.apply(variables, x, train=False))
    scale = np.abs(out_fp).max() + 1e-9
    assert np.abs(out_fp - out_q).max() / scale < 0.05


def test_remat_backbone_identical_outputs_and_grads():
    """Block-remat variant: same param tree, bit-identical forward and grads."""
    m1 = YOLOv1(num_classes=3, S=2, B=2, backbone=ResNetBackbone())
    m2 = YOLOv1(num_classes=3, S=2, B=2, backbone=ResNetBackbone(remat=True))
    x = jnp.ones((1, 64, 64, 3)) * 0.1
    v = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    np.testing.assert_array_equal(
        np.asarray(m1.apply(v, x, train=False)),
        np.asarray(m2.apply(v, x, train=False)),
    )

    def grads(m):
        f = lambda p: jnp.sum(  # noqa: E731
            m.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                    train=False) ** 2
        )
        return jax.grad(f)(v["params"])

    for a, b in zip(jax.tree.leaves(grads(m1)), jax.tree.leaves(grads(m2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
