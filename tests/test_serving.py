"""Serving pipeline: BN fold correctness and the int8-resident engine.

The fold test is the numerical anchor: ``folded_forward`` must reproduce
``model.apply(train=False)`` to float tolerance (it is the fp32 base the
int8 engine quantizes from, and the calibration oracle). The int8 tests
check the engine runs end-to-end and tracks the fp32 forward within
quantization tolerance on a small flagship-shaped config.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.models import ResNetBackbone, YOLOv1, init_model
from yolo_tpu.serving import (
    build_int8_predict,
    calibrate_activations,
    fold_flagship,
    folded_forward,
    quantize_folded,
)
from yolo_tpu.serving.engine import int8_forward


@pytest.fixture(scope="module")
def small_flagship():
    """Full [3,4,6,3]-free config: 1 block per stage, 64^2 input (fast CPU)."""
    model = YOLOv1(
        num_classes=20, S=7, B=2,
        backbone=ResNetBackbone(stage_sizes=(1, 1, 1, 1)),
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=64)
    return model, variables


def test_folded_forward_matches_model(small_flagship):
    model, variables = small_flagship
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))

    want = model.apply(variables, images, train=False)
    folded = fold_flagship(variables)
    got = folded_forward(folded, images)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_int8_forward_tracks_fp32(small_flagship):
    model, variables = small_flagship
    key = jax.random.PRNGKey(2)
    calib = [jax.random.normal(key, (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))

    folded = fold_flagship(variables)
    act_max = calibrate_activations(folded, calib)
    assert all(v > 0 for v in act_max.values())
    q = quantize_folded(folded, act_max)

    ref = folded_forward(folded, images)
    got = int8_forward(q, images, S=model.S)
    assert got.shape == ref.shape
    assert bool(jnp.all(jnp.isfinite(got)))
    # Random-weight activations quantize coarsely; the check is that the
    # int8 graph is the same function, not noise: outputs stay correlated
    # and on-scale with fp32.
    ref_f, got_f = np.asarray(ref).ravel(), np.asarray(got).ravel()
    corr = np.corrcoef(ref_f, got_f)[0, 1]
    assert corr > 0.98, f"int8/fp32 correlation {corr}"


def test_int8_predict_end_to_end(small_flagship):
    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 3))]
    predict, q = build_int8_predict(model, variables, calib)
    images = jax.random.normal(jax.random.PRNGKey(5), (4, 64, 64, 3))
    dets = predict(q, images, 0.01, 0.4)
    assert dets.boxes.shape[0] == 4
    assert dets.valid.dtype == jnp.bool_


def _random_identity_qblock(key, C, P):
    ks = jax.random.split(key, 9)
    ri8 = lambda k, shape: jax.random.randint(k, shape, -127, 128, jnp.int8)
    ru = lambda k, shape, lo, hi: jax.random.uniform(k, shape, jnp.float32, lo, hi)
    return {
        "conv1": {"wq": ri8(ks[0], (1, 1, C, P)),
                  "m": ru(ks[1], (P,), 1e-4, 3e-4), "t": ru(ks[2], (P,), -2, 2)},
        "conv2": {"wq": ri8(ks[3], (3, 3, P, P)),
                  "m": ru(ks[4], (P,), 1e-4, 3e-4), "t": ru(ks[5], (P,), -2, 2)},
        "conv3": {"wq": ri8(ks[6], (1, 1, P, C)),
                  "m": ru(ks[7], (C,), 1e-4, 3e-4), "t": ru(ks[8], (C,), -2, 2)},
        "downsample": None,
        "rx": jnp.float32(0.9),
    }


@pytest.mark.parametrize("H,W,C,P,TH", [(8, 8, 16, 8, 4), (12, 40, 32, 16, 6)])
def test_pallas_int8_bottleneck_matches_xla(H, W, C, P, TH):
    """Fused kernel == XLA int8 block, bit-exact (interpret mode).

    Covers interior/top/bottom halo tiles and the W-padding path (W=40 pads
    to 64 lanes internally).
    """
    from yolo_tpu.serving.engine import _block_xla
    from yolo_tpu.serving.pallas_int8 import block_pallas

    key = jax.random.PRNGKey(0)
    qb = _random_identity_qblock(key, C, P)
    x_q = jax.random.randint(jax.random.PRNGKey(1), (2, H, W, C), -127, 128,
                             jnp.int8)
    want = _block_xla(x_q, qb, stride=1)
    got = block_pallas(x_q, qb, tile_rows=TH, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_int8_bottleneck_padded_width():
    """W % 8 != 0 path (layer3/4 widths): padded x, bit-exact real columns.

    Chains two padded blocks like the engine does (garbage pad columns must
    not leak into real columns across blocks).
    """
    from yolo_tpu.serving.engine import _block_xla
    from yolo_tpu.serving.pallas_int8 import block_pallas

    H, W, C, P = 12, 12, 16, 8
    qb1 = _random_identity_qblock(jax.random.PRNGKey(2), C, P)
    qb2 = _random_identity_qblock(jax.random.PRNGKey(3), C, P)
    x_q = jax.random.randint(jax.random.PRNGKey(4), (2, H, W, C), -127, 128,
                             jnp.int8)
    want = _block_xla(_block_xla(x_q, qb1, stride=1), qb2, stride=1)

    xp = jnp.pad(x_q, ((0, 0), (0, 0), (0, 32 - W), (0, 0)),
                 constant_values=13)  # nonzero pad: leakage would show
    got = block_pallas(xp, qb1, tile_rows=6, interpret=True, real_w=W)
    got = block_pallas(got, qb2, tile_rows=6, interpret=True, real_w=W)
    np.testing.assert_array_equal(np.asarray(got[:, :, :W, :]),
                                  np.asarray(want))


def test_s2d_stem_bit_identical(small_flagship):
    """Space-to-depth stem must give bit-identical int8 results (same MACs)."""
    from yolo_tpu.serving.quant import quantize_folded

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(6), (2, 64, 64, 3))]
    folded = fold_flagship(variables)
    act_max = calibrate_activations(folded, calib)
    q_direct = quantize_folded(folded, act_max, stem_mode="direct")
    q_s2d = quantize_folded(folded, act_max, stem_mode="s2d")
    assert q_s2d["stem"]["wq"].shape[:3] == (4, 4, 12)

    images = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3))
    out_direct = int8_forward(q_direct, images, S=model.S)
    out_s2d = int8_forward(q_s2d, images, S=model.S)
    np.testing.assert_array_equal(np.asarray(out_s2d), np.asarray(out_direct))


def test_conv3x3_retile_matches_direct():
    """Batch-folded tiled conv == direct conv, bit-for-bit (integer math).

    The retile path exists because XLA's int8 conv runs ~2.5x faster on
    (4N, 30, 30, C) valid tiles than on (N, 56, 56, C) — see
    engine._conv3x3_retile_rq."""
    from yolo_tpu.serving.engine import _conv3x3_retile_rq, _conv_i8, _requant

    key = jax.random.PRNGKey(11)
    x = jax.random.randint(key, (3, 16, 16, 32), -127, 127, jnp.int8)
    w = jax.random.randint(key, (3, 3, 32, 48), -127, 127, jnp.int8)
    qc = {
        "wq": w,
        "m": jax.random.uniform(key, (48,), jnp.float32, 1e-4, 1e-2),
        "t": jax.random.uniform(key, (48,), jnp.float32, -0.5, 0.5),
    }
    want = _requant(_conv_i8(x, w, stride=1, pad=1), qc["m"], qc["t"])
    for tiles in (2, 4):
        got = _conv3x3_retile_rq(x, qc, tiles)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_engine_retile_impl_matches_default(small_flagship):
    """conv2_tiles impl == default engine output exactly (incl. the stride-2
    guard: layer2's only block here is its transition, which must stay on
    the direct path)."""
    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(30), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(31), (2, 64, 64, 3))
    _, q = build_int8_predict(model, variables, calib)
    want = int8_forward(q, images, S=model.S)
    got = int8_forward(
        q, images, S=model.S,
        impl={"conv2_tiles": {"layer1": 2, "layer2": 2}},
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_transition_conv2_kernel_bit_exact():
    """Dense-dot stride-2 conv2 kernel == lax conv + requant, bit-for-bit.

    Covers both flagship transition geometries' structure (C multiple of
    128 required by the kernel; here C=128 at two sizes)."""
    from yolo_tpu.serving.engine import _conv_i8, _requant
    from yolo_tpu.serving.pallas_int8 import transition_conv2_int8

    key = jax.random.PRNGKey(40)
    for n, h, c in ((2, 16, 128), (1, 8, 256)):
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, h), 4)
        x = jax.random.randint(k1, (n, h, h, c), -127, 128, jnp.int8)
        w = jax.random.randint(k2, (3, 3, c, c), -127, 128, jnp.int8)
        m = jax.random.uniform(k3, (c,), jnp.float32, 1e-4, 1e-2)
        t = jax.random.uniform(k4, (c,), jnp.float32, -0.5, 0.5)
        want = _requant(_conv_i8(x, w, stride=2, pad=1), m, t)
        got = transition_conv2_int8(x, w, m, t, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_engine_with_transition_conv2_impl_matches_default(small_flagship):
    """Engine with the Pallas transition-conv2 kernel == default engine."""
    from functools import partial

    from yolo_tpu.serving.pallas_int8 import transition_conv2_pallas

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(41), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(42), (2, 64, 64, 3))
    _, q = build_int8_predict(model, variables, calib)
    want = int8_forward(q, images, S=model.S)
    t2 = partial(transition_conv2_pallas, interpret=True)
    got = int8_forward(
        q, images, S=model.S,
        impl={"transition_conv2": {"layer2": t2, "layer3": t2}},
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_engine_with_pallas_impl_matches_xla(small_flagship):
    """Whole int8 forward with Pallas chain kernels == pure-XLA engine.

    Runs the interpret-mode whole-image chain kernels inside the real engine
    on the small flagship (stage chaining incl. layer1's downsample block,
    the aligned AND padded width paths, and the stage-end unpad) — bit-exact
    output grids.
    """
    from functools import partial

    from yolo_tpu.serving.pallas_int8 import chain_pallas

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(8), (2, 64, 64, 3))]
    folded = fold_flagship(variables)
    act_max = calibrate_activations(folded, calib)
    q = quantize_folded(folded, act_max)
    images = jax.random.normal(jax.random.PRNGKey(9), (2, 64, 64, 3))

    want = int8_forward(q, images, S=model.S)
    impl = {f"layer{s}": partial(chain_pallas, interpret=True)
            for s in (1, 2)}
    got = int8_forward(q, images, S=model.S, impl=impl)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_engine_honors_nms_fn(small_flagship):
    """nms_impl='pallas' + optimize='int8' is honored: build_int8_predict
    threads nms_fn into the serving graph, and pallas == xla detections."""
    from functools import partial

    from yolo_tpu.ops.pallas_nms import pallas_nms
    from yolo_tpu.serving import build_int8_predict

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(20), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(21), (2, 64, 64, 3))

    fn_xla, q = build_int8_predict(model, variables, calib)
    fn_pallas, q2 = build_int8_predict(
        model, variables, calib, nms_fn=partial(pallas_nms, interpret=True)
    )
    want = fn_xla(q, images, 0.01, 0.4)
    got = fn_pallas(q2, images, 0.01, 0.4)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=0, atol=0
    )


def test_pallas_chain_padded_width_matches_xla():
    """Chain kernel on a W % 8 != 0 stage (padded path), incl. ds block."""
    from yolo_tpu.serving.engine import _block_xla
    from yolo_tpu.serving.pallas_int8 import chain_pallas

    H, W, C, P = 12, 12, 16, 8
    qbs = [_random_identity_qblock(jax.random.PRNGKey(i), C, P)
           for i in (11, 12)]
    x_q = jax.random.randint(jax.random.PRNGKey(13), (2, H, W, C), -127, 128,
                             jnp.int8)
    want = x_q
    for qb in qbs:
        want = _block_xla(want, qb, stride=1)

    xp = jnp.pad(x_q, ((0, 0), (0, 0), (0, 32 - W), (0, 0)),
                 constant_values=7)
    got = chain_pallas(xp, qbs, real_w=W, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[:, :, :W, :]),
                                  np.asarray(want))


@pytest.mark.parametrize("n,h,w", [(2, 16, 16), (3, 8, 12), (4, 18, 10)])
def test_pallas_stem_front_matches_engine_quant_s2d(n, h, w):
    """quant+s2d kernel == engine's quantize-then-shuffle, bit-exact
    (interpret mode), incl. rows-per-step reduction for odd H/2."""
    from yolo_tpu.serving.engine import _quantize_input
    from yolo_tpu.serving.pallas_stem import quant_s2d_int8

    imgs = jax.random.normal(jax.random.PRNGKey(31), (n, h, w, 3),
                             jnp.bfloat16) * 3
    s = jnp.float32(0.0123)
    xq = _quantize_input(imgs, s)
    want = (
        xq.reshape(n, h // 2, 2, w // 2, 2, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 12)
    )
    got = quant_s2d_int8(imgs, s, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_forward_stem_front_impl(small_flagship):
    """impl['stem_front'] produces the identical engine output; non-128
    batches fall back to the XLA stem front (same result by construction)."""
    from functools import partial

    from yolo_tpu.serving.pallas_stem import stem_front_pallas

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(32), (2, 64, 64, 3))]
    folded = fold_flagship(variables)
    act_max = calibrate_activations(folded, calib)
    q = quantize_folded(folded, act_max)
    images = jax.random.normal(jax.random.PRNGKey(33), (2, 64, 64, 3))

    want = int8_forward(q, images, S=model.S)
    # batch 2 -> the engine's 128-alignment guard must take the XLA path
    # even with the impl present (a compiled-TPU-only kernel otherwise).
    got = int8_forward(
        q, images, S=model.S,
        impl={"stem_front": partial(stem_front_pallas, interpret=True)},
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_forward_bf16_fc1_mode(small_flagship):
    """fc1_mode='bf16' keeps the round-2 formulation working and on-scale
    with the int8-fc1 default (same function up to fc1 weight rounding)."""
    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(34), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(35), (2, 64, 64, 3))

    folded = fold_flagship(variables)
    act_max = calibrate_activations(folded, calib)
    q_i8 = quantize_folded(folded, act_max)
    q_bf = quantize_folded(folded, act_max, fc1_mode="bf16")
    assert "wq" in q_i8["head"]["fc1"] and "w" in q_bf["head"]["fc1"]

    a = np.asarray(int8_forward(q_i8, images, S=model.S)).ravel()
    b = np.asarray(int8_forward(q_bf, images, S=model.S)).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, f"fc1 int8/bf16 correlation {corr}"


@pytest.mark.parametrize("H,C", [(8, 16), (12, 32)])
def test_colpack_transition_conv_matches_strided(H, C):
    """Column-superpixel-packed stride-(2,1) conv == the direct 3x3/s2
    conv + requant, bit-exact (zero-weight taps add exact zeros)."""
    from yolo_tpu.serving.engine import (
        _conv3x3_s2_colpack_rq, _conv_i8, _requant,
    )

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(40), 4)
    y1 = jax.random.randint(k1, (2, H, H, C), -127, 128, jnp.int8)
    qc = {
        "wq": jax.random.randint(k2, (3, 3, C, C), -127, 128, jnp.int8),
        "m": jax.random.uniform(k3, (C,), jnp.float32, 1e-4, 3e-4),
        "t": jax.random.uniform(k4, (C,), jnp.float32, -2, 2),
    }
    want = _requant(_conv_i8(y1, qc["wq"], stride=2, pad=1), qc["m"], qc["t"])
    got = _conv3x3_s2_colpack_rq(y1, qc)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_engine_export_roundtrip(small_flagship, tmp_path):
    """save_engine/load_engine round-trips the q tree exactly: the loaded
    engine's forward is bit-identical, with no model or calibration data
    needed at load time (the deployment-box path)."""
    from yolo_tpu.serving.export import load_engine, save_engine

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(50), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(51), (2, 64, 64, 3))

    folded = fold_flagship(variables)
    act_max = calibrate_activations(folded, calib)
    q = quantize_folded(folded, act_max)
    want = int8_forward(q, images, S=model.S)

    path = tmp_path / "engine.npz"
    save_engine(path, q, S=model.S, B=model.B, num_classes=model.num_classes)
    q2, meta = load_engine(path)
    assert meta["S"] == model.S and meta["num_classes"] == 20
    # Tree structure round-trips (None downsample/rx included).
    assert q2["layers"][0][0]["downsample"] is not None
    assert q2["layers"][1][0]["rx"] is None or "rx" in q2["layers"][1][0]
    got = int8_forward(q2, images, S=meta["S"])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_engine_export_rejects_foreign_files(tmp_path):
    from yolo_tpu.serving.export import load_engine

    path = tmp_path / "not_engine.npz"
    np.savez(path, foo=np.zeros(3))
    with pytest.raises(ValueError, match="not a yolo-tpu engine"):
        load_engine(path)


def test_yoloinference_engine_artifact_roundtrip(small_flagship, tmp_path):
    """YOLOInference: calibrated engine -> save_engine -> a fresh engine
    loaded from the artifact (variables=None, no calibration) produces
    bit-identical detections."""
    from yolo_tpu.inference import YOLOInference

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(60), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(61), (4, 64, 64, 3))

    eng = YOLOInference(model, variables, image_size=64, optimize="int8",
                        calibration=calib)
    want = eng.predict_batch_arrays(images, 0.05, 0.4)
    path = tmp_path / "deploy.npz"
    # force: the 2-image test calibration is below the deployment gate
    # (MIN_CALIB_IMAGES); the gate itself is covered in
    # test_save_engine_calibration_gate.
    eng.save_engine(path, force=True)

    eng2 = YOLOInference(model, None, image_size=64, optimize="int8",
                         engine_artifact=str(path))
    got = eng2.predict_batch_arrays(images, 0.05, 0.4)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_engine_requires_built_engine(small_flagship):
    from yolo_tpu.inference import YOLOInference

    model, variables = small_flagship
    eng = YOLOInference(model, variables, image_size=64, optimize="int8")
    with pytest.raises(RuntimeError, match="no built int8 engine"):
        eng.save_engine("/tmp/never.npz")


def test_save_engine_calibration_gate(small_flagship, tmp_path):
    """The deployment footgun (VERDICT r4 #4): an engine lazily calibrated on
    a single image must REFUSE to freeze its scales into an artifact unless
    forced; an engine calibrated on >= MIN_CALIB_IMAGES saves normally."""
    from yolo_tpu.inference import YOLOInference

    model, variables = small_flagship
    one_image = jax.random.normal(jax.random.PRNGKey(90), (1, 64, 64, 3))

    eng = YOLOInference(model, variables, image_size=64, optimize="int8")
    with pytest.warns(UserWarning, match="only 1 image"):
        eng.predict_batch_arrays(one_image, 0.05, 0.4)  # lazy calibration
    with pytest.raises(RuntimeError, match="refusing to freeze"):
        eng.save_engine(tmp_path / "clipped.npz")
    # force=True overrides deliberately.
    eng.save_engine(tmp_path / "forced.npz", force=True)
    assert (tmp_path / "forced.npz").exists()

    # Explicit calibration at/above the gate saves without force.
    calib = [jax.random.normal(jax.random.PRNGKey(91),
                               (YOLOInference.MIN_CALIB_IMAGES, 64, 64, 3))]
    eng2 = YOLOInference(model, variables, image_size=64, optimize="int8",
                         calibration=calib)
    eng2.save_engine(tmp_path / "ok.npz")
    assert (tmp_path / "ok.npz").exists()

    # An engine restored from an artifact is exempt (scales already frozen
    # by an earlier, gated save) — re-export round-trips.
    eng3 = YOLOInference(model, None, image_size=64, optimize="int8",
                         engine_artifact=str(tmp_path / "ok.npz"))
    eng3.save_engine(tmp_path / "reexport.npz")
    assert (tmp_path / "reexport.npz").exists()


def test_save_engine_gate_counts_real_images_not_padding(
    small_flagship, tmp_path
):
    """predict_batch_files zero-pads ragged chunks to batch_size; the lazy
    calibration must count (and calibrate on) only the REAL images, so a
    3-image directory still trips the save_engine gate instead of being
    silently waved through as a full padded batch."""
    from PIL import Image

    from yolo_tpu.inference import YOLOInference

    model, variables = small_flagship
    rng = np.random.default_rng(7)
    paths = []
    for i in range(3):
        img = Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
        )
        p = tmp_path / f"img_{i}.jpg"
        img.save(p)
        paths.append(str(p))

    eng = YOLOInference(model, variables, image_size=64, optimize="int8")
    with pytest.warns(UserWarning, match="only 3 image"):
        eng.predict_batch_files(paths, 0.05, 0.4, batch_size=16)
    assert eng._int8_state["n_calib"] == 3
    assert "pending_valid" not in eng._int8_state
    with pytest.raises(RuntimeError, match="refusing to freeze"):
        eng.save_engine(tmp_path / "padded.npz")


def test_calibration_generator_counts_images(small_flagship, tmp_path):
    """A generator calibration iterable is materialized before the build
    consumes it, so n_calib reflects the images actually calibrated on and
    save_engine does not spuriously refuse."""
    from yolo_tpu.inference import YOLOInference

    model, variables = small_flagship
    batches = [jax.random.normal(jax.random.PRNGKey(92),
                                 (YOLOInference.MIN_CALIB_IMAGES, 64, 64, 3))]
    eng = YOLOInference(model, variables, image_size=64, optimize="int8",
                        calibration=(b for b in batches))
    assert eng._int8_state["n_calib"] == YOLOInference.MIN_CALIB_IMAGES
    eng.save_engine(tmp_path / "gen.npz")
    assert (tmp_path / "gen.npz").exists()


def test_sharded_int8_engine_matches_single_device(small_flagship):
    """DP-sharded serving == single-device engine, bit-equal: replicated
    q, batch sharded over 'data', zero collectives in the graph."""
    from yolo_tpu.parallel import make_mesh
    from yolo_tpu.parallel.mesh import put_sharded
    from yolo_tpu.serving.engine import make_sharded_int8_engine_fn

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(70), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(71), (8, 64, 64, 3))

    predict, q = build_int8_predict(model, variables, calib)
    want = predict(q, images, 0.05, 0.4)

    mesh = make_mesh(n_data=8, n_model=1)
    sharded = make_sharded_int8_engine_fn(
        mesh, model.S, model.B, model.num_classes
    )
    got = sharded(q, put_sharded(mesh, images), 0.05, 0.4)
    # The int8 conv torso is integer-exact per shard; the bf16/f32 FC dot
    # tiles differently at per-device batch size, so sub-threshold grid
    # values can differ in the last ulp. The serving contract is the
    # detection SET: identical valid masks, and identical detections on
    # the valid slots (float-tolerant on box coords/scores).
    va, vb = np.asarray(want.valid), np.asarray(got.valid)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(
        np.asarray(want.class_ids)[va], np.asarray(got.class_ids)[vb]
    )
    np.testing.assert_allclose(
        np.asarray(want.scores)[va], np.asarray(got.scores)[vb], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(want.boxes)[va], np.asarray(got.boxes)[vb], rtol=1e-4,
        atol=1e-6,
    )


def test_int8_forward_uint8_wire_matches_float(small_flagship):
    """Raw uint8 RGB input == device-normalized float input, bit-exact:
    the uint8 wire format only moves ImageNet normalization in-graph."""
    from yolo_tpu.data.transforms import device_normalize

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(80), (2, 64, 64, 3))]
    folded = fold_flagship(variables)
    act_max = calibrate_activations(folded, calib)
    q = quantize_folded(folded, act_max)

    u8 = jax.random.randint(
        jax.random.PRNGKey(81), (2, 64, 64, 3), 0, 256, jnp.uint8
    )
    want = int8_forward(q, device_normalize(u8), S=model.S)
    got = int8_forward(q, u8, S=model.S)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # Direct-stem (non-s2d) engine takes the same wire format.
    q7 = quantize_folded(folded, act_max, stem_mode="direct")
    want7 = int8_forward(q7, device_normalize(u8), S=model.S)
    got7 = int8_forward(q7, u8, S=model.S)
    np.testing.assert_array_equal(np.asarray(got7), np.asarray(want7))


def test_pallas_stem_front_uint8(small_flagship):
    """The stem-front kernel's uint8 path == XLA normalize+quant+s2d
    (interpret mode; <=1 LSB for mul/add contraction differences)."""
    from yolo_tpu.data.transforms import device_normalize
    from yolo_tpu.serving.engine import _quantize_input
    from yolo_tpu.serving.pallas_stem import quant_s2d_int8

    u8 = jax.random.randint(
        jax.random.PRNGKey(82), (2, 16, 16, 3), 0, 256, jnp.uint8
    )
    s = jnp.float32(0.00934)
    xq = _quantize_input(device_normalize(u8), s)
    n, h, w, _ = u8.shape
    want = (
        xq.reshape(n, h // 2, 2, w // 2, 2, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 12)
    )
    got = quant_s2d_int8(u8, s, interpret=True)
    diff = np.abs(
        np.asarray(got, np.int32) - np.asarray(want, np.int32)
    )
    assert diff.max() <= 1, f"uint8 stem kernel max LSB diff {diff.max()}"


def test_yoloinference_uint8_wire(small_flagship):
    """YOLOInference accepts uint8 batches on both engines; detections
    match the normalized-float call."""
    from yolo_tpu.data.transforms import device_normalize
    from yolo_tpu.inference import YOLOInference

    model, variables = small_flagship
    u8 = jax.random.randint(
        jax.random.PRNGKey(83), (2, 64, 64, 3), 0, 256, jnp.uint8
    )
    f32 = device_normalize(u8)

    eng = YOLOInference(model, variables, image_size=64)
    want = eng.predict_batch_arrays(f32, 0.01, 0.4)
    got = eng.predict_batch_arrays(u8, 0.01, 0.4)
    np.testing.assert_array_equal(np.asarray(want.valid), np.asarray(got.valid))
    np.testing.assert_allclose(
        np.asarray(want.scores), np.asarray(got.scores), rtol=1e-4, atol=1e-5
    )

    # int8 engine, lazy calibration on the uint8 batch itself: scales must
    # come from NORMALIZED data (a raw 0..255 calibration would blow s_img
    # up ~100x and zero out the quantized activations).
    eng8 = YOLOInference(model, variables, image_size=64, optimize="int8")
    dets = eng8.predict_batch_arrays(u8, 0.01, 0.4)
    assert dets.boxes.shape[0] == 2
    s_img = float(eng8._int8_state["q"]["s_img"])
    want_s = float(jnp.max(jnp.abs(f32)) / 127.0)
    # bf16 calibration rounding allows small drift; the failure mode being
    # ruled out is the ~100x raw-0..255 scale.
    assert abs(s_img - want_s) / want_s < 0.01


# ------------------------------------------------------------------ winograd
def test_winograd_algebra_matches_direct_conv():
    """Exact integer taps x UNQUANTIZED weight taps == the direct f32 conv.

    Isolates the F(2,3) transform matrices, tiling, and tile scatter from
    quantization (incl. the odd-dim pad/crop path at h=7).
    """
    from yolo_tpu.serving import winograd as W
    from jax import lax

    rng = np.random.default_rng(0)
    for h in (14, 7, 8):
        n, c, k = 2, 16, 24
        x_q = jnp.asarray(rng.integers(-127, 128, (n, h, h, c)), jnp.int8)
        w = jnp.asarray(rng.normal(size=(3, 3, c, k)), jnp.float32)
        th = (h + 1) // 2
        taps = W.input_taps_i32(x_q, th)
        v = jnp.stack(
            [t.reshape(n * th * th, c).astype(jnp.float32) for t in taps]
        )
        u = jnp.einsum("ai,bj,ijck->abck", jnp.asarray(W.G), jnp.asarray(W.G),
                       w).reshape(16, c, k)
        m = jnp.einsum("tmc,tck->tmk", v, u)
        a2 = jnp.asarray(
            np.einsum("ra,sb->rsab", W.A_T, W.A_T).reshape(4, 16)
        )
        y = jnp.einsum("pt,tmk->pmk", a2, m)
        y = (y.reshape(2, 2, n, th, th, k).transpose(2, 3, 0, 4, 1, 5)
             .reshape(n, 2 * th, 2 * th, k)[:, :h, :h])
        ref = lax.conv_general_dilated(
            x_q.astype(jnp.float32), w, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref),
            rtol=1e-5, atol=1e-3 * float(jnp.max(jnp.abs(ref))),
        )


def test_winograd_int8_conv_tracks_direct_int8():
    """The per-tap int8 path stays within a few LSB of the fp32 truth."""
    from jax import lax

    from yolo_tpu.serving import winograd as W
    from yolo_tpu.serving.engine import _conv_i8, _requant
    from yolo_tpu.serving.quant import _layer

    rng = np.random.default_rng(1)
    n, h, c, k = 4, 14, 64, 32
    s_in, s_out = 0.05, 0.08
    x_q = jnp.asarray(rng.integers(-127, 128, (n, h, h, c)), jnp.int8)
    w = jnp.asarray(rng.normal(size=(3, 3, c, k)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(k,)) * 0.5, jnp.float32)
    qc = dict(_layer(w, b, s_in, s_out))
    x_f = x_q.astype(jnp.float32) * s_in
    qc["wino"] = W.wino_quantize(w, b, s_in, s_out, W.tap_maxima(x_f))

    y_wino = W.conv3x3_wino_rq(x_q, qc, leaky=True)
    y_dir = _requant(_conv_i8(x_q, qc["wq"], 1, 1), qc["m"], qc["t"],
                     leaky=True)
    ref = lax.conv_general_dilated(
        x_f, w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    ref = jnp.where(ref > 0, ref, 0.1 * ref)
    ref_q = np.clip(np.round(np.asarray(ref) / s_out), -127, 127)

    d_dir = np.abs(np.asarray(y_dir, np.int32) - ref_q)
    d_wino = np.abs(np.asarray(y_wino, np.int32) - ref_q)
    # Direct int8 lands within ~4 LSB on this data; the Winograd path adds
    # bounded per-tap rounding on top. Both are far from the ±127 range.
    assert d_dir.max() <= 6
    assert d_wino.max() <= 12
    assert d_wino.mean() <= 1.5


def test_engine_wino_impl_tracks_default(small_flagship):
    """build_int8_predict(wino=...) wires calibration+params+hooks e2e."""
    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(6), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3))

    predict0, q0 = build_int8_predict(model, variables, calib)
    # head convs at 2² (conv1, even) and 1² (conv3/4, odd-crop path);
    # l1b0 is the one stride-1 conv2 block in the 1-block-per-stage config.
    wino = ("head_conv1", "head_conv3", "head_conv4", "l1b0_conv2")
    predict1, q1 = build_int8_predict(model, variables, calib, wino=wino)
    assert "wino" in q1["head"]["conv1"] and "wino" in q1["head"]["conv3"]
    assert "wino" in q1["layers"][0][0]["conv2"]

    d0 = predict0(q0, images, 0.01, 0.4)
    d1 = predict1(q1, images, 0.01, 0.4)
    # Same engine up to bounded tap-rounding: scores of the two detection
    # sets stay tightly correlated.
    s0 = np.asarray(d0.scores, np.float32).ravel()
    s1 = np.asarray(d1.scores, np.float32).ravel()
    assert s0.shape == s1.shape
    corr = np.corrcoef(s0, s1)[0, 1]
    assert corr > 0.95, f"wino/default score correlation {corr}"


def test_pallas_wino_matches_xla_wino_interpret():
    """The fused Pallas Winograd kernel == the XLA wino path (interpret).

    Same taps, same per-tap scales, same epilogue; f32 op-order in the
    inverse transform may differ by 1 LSB after the round-to-int8.
    """
    from yolo_tpu.serving import winograd as W
    from yolo_tpu.serving.pallas_wino import conv3x3_wino_pallas
    from yolo_tpu.serving.quant import _layer

    rng = np.random.default_rng(3)
    for h, c, k, leaky in ((8, 128, 256, True), (14, 64, 128, False)):
        n = 4
        s_in, s_out = 0.04, 0.07
        x_q = jnp.asarray(rng.integers(-127, 128, (n, h, h, c)), jnp.int8)
        w = jnp.asarray(rng.normal(size=(3, 3, c, k)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(k,)) * 0.5, jnp.float32)
        qc = dict(_layer(w, b, s_in, s_out))
        x_f = x_q.astype(jnp.float32) * s_in
        qc["wino"] = W.wino_quantize(w, b, s_in, s_out, W.tap_maxima(x_f))

        y_xla = W.conv3x3_wino_rq(x_q, qc, leaky=leaky)
        y_pl = conv3x3_wino_pallas(x_q, qc, leaky=leaky, img_chunk=2,
                                   interpret=True)
        d = np.abs(np.asarray(y_pl, np.int32) - np.asarray(y_xla, np.int32))
        assert d.max() <= 1, f"h={h}: max delta {d.max()}"
        assert (d > 0).mean() < 0.01


def test_wino_engine_artifact_roundtrip(small_flagship, tmp_path):
    """A wino-built engine survives save_engine/load: the nested per-tap
    params round-trip and the artifact loader re-installs the wino impl
    hooks (wino_points_of) — no silent direct-conv fallback."""
    from yolo_tpu.inference import YOLOInference
    from yolo_tpu.serving.winograd import wino_points_of

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(70), (2, 64, 64, 3))]
    images = jax.random.normal(jax.random.PRNGKey(71), (4, 64, 64, 3))

    wino = ("head_conv1", "l1b0_conv2")
    eng = YOLOInference(model, variables, image_size=64, optimize="int8",
                        calibration=calib, wino=wino)
    want = eng.predict_batch_arrays(images, 0.05, 0.4)
    path = tmp_path / "deploy_wino.npz"
    eng.save_engine(path, force=True)  # 2-image test calib < MIN_CALIB_IMAGES

    eng2 = YOLOInference(model, None, image_size=64, optimize="int8",
                         engine_artifact=str(path))
    assert set(wino_points_of(eng2._int8_state["q"])) == set(wino)
    got = eng2.predict_batch_arrays(images, 0.05, 0.4)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------------ batcher
def _batcher_engine(small_flagship, conf=0.05, nms=0.4):
    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(80), (2, 64, 64, 3))]
    predict, q = build_int8_predict(model, variables, calib)
    return lambda images: predict(q, images, conf, nms)


def test_request_batcher_matches_per_image_calls(small_flagship):
    """Batcher assembly/pad/slice is exact, and pad rows are inert.

    Bit-exact vs a direct call on the same padded bucket (same compiled
    graph); tolerance vs independent per-image calls (different batch
    shape -> different XLA op order at float ULP level)."""
    from yolo_tpu.serving import RequestBatcher

    predict = _batcher_engine(small_flagship)
    images = np.asarray(
        jax.random.normal(jax.random.PRNGKey(81), (5, 64, 64, 3)), np.float32
    )
    with RequestBatcher(predict, (64, 64, 3), buckets=(8,),
                        max_delay_ms=500.0) as b:
        b.warmup()
        futs = [b.submit(img) for img in images]
        got = [f.result(timeout=60) for f in futs]

    padded = np.zeros((8, 64, 64, 3), np.float32)
    padded[:5] = images
    bucket_want = jax.device_get(predict(padded))
    for i, g in enumerate(got):
        for a, w in zip(jax.tree.leaves(g), jax.tree.leaves(bucket_want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(w[i]))
        single = jax.device_get(predict(images[i : i + 1]))
        for a, w in zip(jax.tree.leaves(g), jax.tree.leaves(single)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(w[0], np.float32),
                rtol=1e-4, atol=1e-6,
            )


def test_request_batcher_coalesces_into_buckets(small_flagship):
    """Concurrent submits ride one padded bucket; stats expose occupancy."""
    from yolo_tpu.serving import RequestBatcher

    predict = _batcher_engine(small_flagship)
    images = np.zeros((6, 64, 64, 3), np.float32)
    b = RequestBatcher(predict, (64, 64, 3), buckets=(1, 4, 8),
                       max_delay_ms=500.0)
    b.warmup()
    # Stall the worker's first get() window: submit everything at once.
    futs = [b.submit(img) for img in images]
    for f in futs:
        f.result(timeout=60)
    b.close()
    assert b.images_served == 6
    # 500 ms fill window >> submit loop: at most 2 batches (typically 1+1
    # after the first request opens a batch).
    assert b.batches_dispatched <= 2


def test_request_batcher_single_request_flushes_on_timeout(small_flagship):
    """A lone request is served after max_delay without co-riders."""
    from yolo_tpu.serving import RequestBatcher

    predict = _batcher_engine(small_flagship)
    b = RequestBatcher(predict, (64, 64, 3), buckets=(4,), max_delay_ms=5.0)
    b.warmup()
    fut = b.submit(np.zeros((64, 64, 3), np.float32))
    res = fut.result(timeout=60)
    assert jax.tree.leaves(res)[0].shape[0] > 0  # per-image K candidates
    b.close()
    assert b.batches_dispatched == 1 and b.images_served == 1


def test_request_batcher_validates_and_propagates_errors(small_flagship):
    from yolo_tpu.serving import RequestBatcher

    predict = _batcher_engine(small_flagship)
    b = RequestBatcher(predict, (64, 64, 3), buckets=(1,))
    with pytest.raises(ValueError, match="image shape"):
        b.submit(np.zeros((32, 32, 3), np.float32))

    def boom(images):
        raise RuntimeError("engine down")

    b2 = RequestBatcher(boom, (64, 64, 3), buckets=(1,))
    fut = b2.submit(np.zeros((64, 64, 3), np.float32))
    with pytest.raises(RuntimeError, match="engine down"):
        fut.result(timeout=60)
    b2.close()
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros((64, 64, 3), np.float32))


def test_request_batcher_cancelled_future_does_not_kill_worker(small_flagship):
    """A caller cancelling its future while the batch computes must not
    crash the worker (set_result on a cancelled future raises)."""
    import threading

    from yolo_tpu.serving import RequestBatcher

    predict = _batcher_engine(small_flagship)
    gate = threading.Event()

    def slow_predict(images):
        gate.wait(timeout=30)
        return predict(images)

    b = RequestBatcher(slow_predict, (64, 64, 3), buckets=(1,),
                       max_delay_ms=1.0)
    f1 = b.submit(np.zeros((64, 64, 3), np.float32))
    f1.cancel()  # pending or running; cancel best-effort
    gate.set()
    # Worker must survive to serve the next request.
    f2 = b.submit(np.ones((64, 64, 3), np.float32))
    assert f2.result(timeout=60) is not None
    b.close()


# ---------------------------------------------------------------- AOT export


def test_aot_compiled_engine_roundtrip(small_flagship, tmp_path):
    """save_compiled_engine -> load_compiled_engine reproduces the live
    engine bit-for-bit: the artifact carries the SAME lowered graph, so the
    deserialized StableHLO compiles to identical numerics on this host."""
    from yolo_tpu.serving import (
        build_int8_predict,
        load_compiled_engine,
        save_compiled_engine,
    )

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(90), (2, 64, 64, 3))]
    live, q = build_int8_predict(model, variables, calib)

    path = tmp_path / "engine_aot.npz"
    save_compiled_engine(
        path, q, model.S, model.B, model.num_classes,
        batch_size=2, image_size=64, conf_threshold=0.05, nms_threshold=0.4,
        dtype=np.uint8, platforms=("cpu",),
    )
    predict, meta = load_compiled_engine(path)
    assert meta["batch_size"] == 2 and meta["image_size"] == 64
    assert meta["conf_threshold"] == pytest.approx(0.05)

    images = np.asarray(
        jax.random.randint(jax.random.PRNGKey(91), (2, 64, 64, 3), 0, 256),
        np.uint8,
    )
    want = live(q, images, 0.05, 0.4)
    got = predict(images)

    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_array_equal(
        np.asarray(got.class_ids), np.asarray(want.class_ids)
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(want.boxes), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=0, atol=1e-6
    )


def test_aot_artifact_and_plain_artifact_reject_each_other(
    small_flagship, tmp_path
):
    from yolo_tpu.serving import (
        build_int8_predict,
        load_compiled_engine,
        load_engine,
        save_compiled_engine,
        save_engine,
    )

    model, variables = small_flagship
    calib = [jax.random.normal(jax.random.PRNGKey(92), (2, 64, 64, 3))]
    _, q = build_int8_predict(model, variables, calib)

    plain = tmp_path / "plain.npz"
    save_engine(plain, q, model.S, model.B, model.num_classes)
    with pytest.raises(ValueError, match="AOT"):
        load_compiled_engine(plain)

    aot = tmp_path / "aot.npz"
    save_compiled_engine(
        aot, q, model.S, model.B, model.num_classes,
        batch_size=1, image_size=64, conf_threshold=0.05, nms_threshold=0.4,
        platforms=("cpu",),
    )
    with pytest.raises(ValueError, match="artifact"):
        load_engine(aot)


# ---------------------------------------------------------------- HTTP server


def _post_image(port, array_u8, path="/predict"):
    import http.client
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(array_u8).save(buf, format="PNG")
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(
        "POST", path, body=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    resp = conn.getresponse()
    body = json.loads(resp.read().decode())
    conn.close()
    return resp.status, body


def test_http_server_serves_predictions(small_flagship):
    """POST /predict returns the same detections as a direct engine call on
    the identically-preprocessed image; /healthz reports served counts."""
    import http.client

    from yolo_tpu.serving import YOLOServer
    from yolo_tpu.serving.server import detections_to_json

    predict = _batcher_engine(small_flagship)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)

    with YOLOServer(predict, image_size=64, buckets=(1, 2),
                    max_delay_ms=1.0) as server:
        server.warmup()
        status, body = _post_image(server.port, img)
        assert status == 200

        # PNG is lossless, so the server-side array is exactly
        # eval_transform(img) -> a direct call on that must agree.
        from yolo_tpu.data.transforms import eval_transform

        pre = eval_transform(img, (64, 64), normalize_host=False)
        want_batch = predict(pre[None])
        want = detections_to_json(
            jax.tree.map(lambda a: np.asarray(a)[0], want_batch),
            server._class_names,
        )
        assert body["detections"] == want
        for det in body["detections"]:
            assert set(det) >= {"class_id", "class_name", "score", "box"}
            assert len(det["box"]) == 4

        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read().decode())
        conn.close()
        assert health["status"] == "ok"
        assert health["images_served"] >= 1


def test_http_server_error_paths(small_flagship):
    import http.client

    from yolo_tpu.serving import YOLOServer

    predict = _batcher_engine(small_flagship)
    with YOLOServer(predict, image_size=64, buckets=(1,)) as server:
        # Garbage body -> 400, not a crash.
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("POST", "/predict", body=b"not an image")
        resp = conn.getresponse()
        assert resp.status == 400
        assert "error" in json.loads(resp.read().decode())
        conn.close()

        # Unknown paths -> 404 on both verbs.
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
        conn.close()

        # Server still healthy after the errors.
        rng = np.random.default_rng(8)
        status, body = _post_image(
            server.port, rng.integers(0, 256, (64, 64, 3), np.uint8)
        )
        assert status == 200 and "detections" in body


def test_http_server_request_hygiene(small_flagship):
    """Advisor items: malformed Content-Length -> 400 (not a traceback),
    oversized body -> 413, and a failed bind closes the batcher worker."""
    import http.client

    from yolo_tpu.serving import YOLOServer

    predict = _batcher_engine(small_flagship)
    with YOLOServer(predict, image_size=64, buckets=(1,),
                    max_body_bytes=100_000) as server:
        # Malformed Content-Length -> 400.
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", "banana")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "Content-Length" in json.loads(resp.read().decode())["error"]
        conn.close()

        # Body over the cap -> 413 without reading it into memory.
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("POST", "/predict", body=b"x" * 200_000)
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()

        # A second server on the same port: bind fails, batcher not leaked.
        import pytest as _pytest

        with _pytest.raises(OSError):
            YOLOServer(predict, image_size=64, buckets=(1,),
                       host=server.host, port=server.port)

        # First server still healthy.
        rng = np.random.default_rng(9)
        status, body = _post_image(
            server.port, rng.integers(0, 256, (32, 32, 3), np.uint8)
        )
        assert status == 200 and "detections" in body
