"""Fused Pallas BN(+residual)+ReLU vs the unfused flax path.

The fused path is a performance switch (ops/fused_bn.py): same math as
flax.linen.BatchNorm train mode (f32 fast-variance stats, bf16 normalize)
plus the bottleneck's residual/ReLU, so outputs, gradients, running-stat
updates, and the parameter tree must all agree with the unfused modules
within bf16 tolerance. Kernels run in interpret mode off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from yolo_tpu.models.backbones import Bottleneck, ResNetBackbone
from yolo_tpu.ops.fused_bn import bn_normalize, bn_stats, fused_bn_act


def _ref_bn_act(x, scale, bias, residual=None, relu=True, dtype=jnp.bfloat16):
    """The exact unfused recipe: flax fast-variance BN -> bf16 -> +res -> relu."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2))
    var = jnp.maximum(0.0, (xf * xf).mean(axis=(0, 1, 2)) - mean * mean)
    y = (xf - mean) * (jax.lax.rsqrt(var + 1e-5) * scale) + bias
    y = y.astype(dtype)
    if residual is not None:
        y = y + residual
    if relu:
        y = jnp.maximum(y, 0)
    return y.astype(dtype), mean, var


@pytest.mark.parametrize("c", [64, 128, 256])
def test_stats_match_flax_recipe(c):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, c), jnp.bfloat16)
    mean, var = bn_stats(x)
    _, want_mean, want_var = _ref_bn_act(x, jnp.ones(c), jnp.zeros(c))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(want_var),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("with_res", [False, True])
def test_forward_matches_unfused(relu, with_res):
    c = 128
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(k1, (4, 8, 8, c), jnp.bfloat16)
    scale = jax.random.uniform(k2, (c,), jnp.float32, 0.5, 1.5)
    bias = jax.random.normal(k3, (c,), jnp.float32) * 0.1
    res = jax.random.normal(k4, x.shape, jnp.bfloat16) if with_res else None

    out, mean, var = fused_bn_act(x, scale, bias, residual=res, relu=relu)
    want, want_mean, want_var = _ref_bn_act(x, scale, bias, res, relu)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.02,
    )


@pytest.mark.parametrize("c", [64, 256])
@pytest.mark.parametrize("with_res", [False, True])
def test_gradients_match_autodiff(c, with_res):
    """custom_vjp grads == jax.grad through the reference recipe (f32 run
    for a tight tolerance; the kernels compute f32 internally)."""
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(k1, (2, 4, 4, c), jnp.float32)
    scale = jax.random.uniform(k2, (c,), jnp.float32, 0.5, 1.5)
    bias = jax.random.normal(k3, (c,), jnp.float32) * 0.1
    res = jax.random.normal(k4, x.shape, jnp.float32) if with_res else None
    g = jax.random.normal(k5, x.shape, jnp.float32)

    def loss_fused(x, scale, bias, res):
        out, _, _ = fused_bn_act(x, scale, bias, residual=res, relu=True)
        return jnp.sum(out * g)

    def loss_ref(x, scale, bias, res):
        out, _, _ = _ref_bn_act(x, scale, bias, res, True, dtype=jnp.float32)
        return jnp.sum(out * g)

    args = (x, scale, bias, res) if with_res else (x, scale, bias, None)
    argnums = (0, 1, 2, 3) if with_res else (0, 1, 2)
    got = jax.grad(loss_fused, argnums)(*args)
    want = jax.grad(loss_ref, argnums)(*args)
    for gv, wv, name in zip(got, want, ["dx", "dscale", "dbias", "dres"]):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )


def test_bn_normalize_relu_boundary():
    """ReLU uses the bf16-rounded sum (op-order parity with the unfused
    graph): a pre-activation that rounds to exactly 0 must stay 0."""
    c = 128
    x = jnp.zeros((1, 2, 4, c), jnp.bfloat16)
    out = bn_normalize(x, jnp.ones(c), jnp.zeros(c), relu=True)
    assert float(jnp.max(jnp.abs(out))) == 0.0


@pytest.mark.parametrize("mode", ["stats", "full"])
def test_bottleneck_fused_matches_unfused(mode):
    """Same params/stats tree; train-mode outputs within bf16 tolerance;
    updated batch_stats match — for both the production "stats" path and
    the reference "full" custom-vjp path."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 64), jnp.bfloat16)
    kinds = dict(planes=16, stride=2, downsample=True, dtype=jnp.bfloat16)
    ref = Bottleneck(**kinds)
    fused = Bottleneck(**kinds, fused_bn=mode)
    variables = ref.init(jax.random.PRNGKey(4), x, False)

    # Identical tree: fused init produces the same structure.
    vf = fused.init(jax.random.PRNGKey(4), x, False)
    assert jax.tree.structure(variables) == jax.tree.structure(vf)

    want, wmut = ref.apply(variables, x, True, mutable=["batch_stats"])
    got, gmut = fused.apply(variables, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )
    for (kw, vw), (kg, vg) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(wmut), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gmut), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(vg), np.asarray(vw),
                                   rtol=1e-3, atol=1e-4, err_msg=str(kw))

    # Eval mode equivalence through the same running stats.
    we = ref.apply(variables, x, False)
    ge = fused.apply(variables, x, False)
    np.testing.assert_allclose(
        np.asarray(ge, np.float32), np.asarray(we, np.float32),
        rtol=0.02, atol=0.02,
    )


@pytest.mark.parametrize("mode", ["stats", "full"])
def test_resnet_fused_grads_close(mode):
    """End-to-end slim ResNet: fused-vs-unfused loss gradients agree."""
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3), jnp.bfloat16)
    ref = ResNetBackbone(dtype=jnp.bfloat16, stage_sizes=(1, 1))
    fused = ResNetBackbone(dtype=jnp.bfloat16, stage_sizes=(1, 1),
                           fused_bn=mode)
    variables = ref.init(jax.random.PRNGKey(6), x, False)

    def loss(mdl, params):
        out, _ = mdl.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"],
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    lw, gw = jax.value_and_grad(lambda p: loss(ref, p))(variables["params"])
    lg, gg = jax.value_and_grad(lambda p: loss(fused, p))(variables["params"])
    np.testing.assert_allclose(float(lg), float(lw), rtol=1e-2)
    flat_w = jax.tree_util.tree_leaves_with_path(gw)
    flat_g = jax.tree_util.tree_leaves_with_path(gg)
    for (kw, vw), (_, vg) in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(vg, np.float32), np.asarray(vw, np.float32),
            rtol=0.1, atol=5e-3, err_msg=str(kw),
        )
