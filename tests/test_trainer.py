"""Trainer + data-parallel sharding tests on the 8-device CPU mesh.

The reference has no distributed tests (SURVEY.md §4); here the full jitted
train step runs on a real ('data','model') mesh and is checked against the
single-device step for numerical equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_tpu.models import Backbone, SimpleHead, YOLOv1
from yolo_tpu.parallel import make_mesh
from yolo_tpu.training import Trainer, make_optimizer


class Cheap(Backbone):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.avg_pool(x, (4, 4), strides=(4, 4))  # 56 -> 14
        return nn.Conv(8, (3, 3), padding=1)(x)


def tiny_model():
    # SimpleHead instead of the flagship DetectionHead: same fc1/fc2 names
    # (so the TP partition rules apply identically) at ~12M params instead of
    # ~240M — the mesh/step math under test is head-architecture agnostic.
    return YOLOv1(num_classes=20, S=7, B=2, backbone=Cheap(),
                  detection_head=SimpleHead(num_classes=20, S=7, B=2))


def tiny_batch(batch=8):
    rng = np.random.default_rng(0)
    images = rng.normal(size=(batch, 56, 56, 3)).astype(np.float32)
    targets = np.zeros((batch, 7, 7, 30), np.float32)
    targets[:, 3, 3, 0:5] = [0.5, 0.5, 0.2, 0.2, 1.0]
    targets[:, 3, 3, 10 + 7] = 1.0
    return images, targets


def test_train_step_decreases_loss():
    # lr matches the reference recipe (1e-4): at 1e-3 the untrained head's
    # 50k-fan-in FC amplifies each Adam step enough to diverge in a few steps.
    model = tiny_model()
    tx = make_optimizer(1e-4, 0.0, milestones_steps=[])
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=56)
    images, targets = tiny_batch()
    images, targets = jnp.asarray(images), jnp.asarray(targets)

    losses = []
    for _ in range(10):
        state, parts = trainer._train_step(state, images, targets)
        losses.append(float(parts["total"]))
    assert losses[-1] < losses[0]
    assert int(jax.device_get(state.step)) == 10


def test_multidevice_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    model = tiny_model()
    images, targets = tiny_batch(8)

    tx = make_optimizer(1e-3, 5e-4, milestones_steps=[])
    solo = Trainer(model, tx)
    state1 = solo.create_state(jax.random.PRNGKey(0), image_size=56)

    mesh = make_mesh(n_data=4, n_model=2)
    dp = Trainer(model, tx, mesh=mesh)
    state2 = dp.create_state(jax.random.PRNGKey(0), image_size=56)

    i1, t1 = jnp.asarray(images), jnp.asarray(targets)
    i2, t2 = dp.put_batch(images, targets)

    for _ in range(3):
        state1, parts1 = solo._train_step(state1, i1, t1)
        state2, parts2 = dp._train_step(state2, i2, t2)

    np.testing.assert_allclose(
        float(parts1["total"]), float(parts2["total"]), rtol=2e-4
    )
    # Parameters agree across the sharded and unsharded runs. atol covers
    # reduction-order float noise on near-zero params (psum over 4 shards vs
    # one fused sum); rtol covers everything of meaningful magnitude.
    p1 = jax.tree.leaves(jax.device_get(state1.params))
    p2 = jax.tree.leaves(jax.device_get(state2.params))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)


def test_fc_params_are_sharded_on_model_axis():
    model = tiny_model()
    tx = make_optimizer(1e-3, 0.0, milestones_steps=[])
    mesh = make_mesh(n_data=4, n_model=2)
    trainer = Trainer(model, tx, mesh=mesh)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=56)
    fc1_kernel = state.params["detection_head"]["fc1"]["Dense_0"]["kernel"]
    spec = fc1_kernel.sharding.spec
    assert "model" in str(spec), f"fc1 kernel not TP-sharded: {spec}"


def test_freeze_backbone_zeroes_updates():
    model = tiny_model()
    trainer0 = Trainer(model, make_optimizer(1e-3, 0.0))
    state = trainer0.create_state(jax.random.PRNGKey(0), image_size=56)
    tx = make_optimizer(
        1e-3, 0.0, milestones_steps=[], freeze_backbone=True, params=state.params
    )
    trainer = Trainer(model, tx)
    state = state.replace(opt_state=tx.init(state.params))
    images, targets = tiny_batch()
    before = jax.device_get(state.params["backbone"])
    head_before = jax.device_get(state.params["detection_head"])
    state, _ = trainer._train_step(state, jnp.asarray(images), jnp.asarray(targets))
    after = jax.device_get(state.params["backbone"])
    head_after = jax.device_get(state.params["detection_head"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(head_before), jax.tree.leaves(head_after))
    )


def test_validate_and_epoch_loop(tmp_path):
    from yolo_tpu.training import train

    model = tiny_model()
    tx = make_optimizer(1e-3, 0.0, milestones_steps=[])
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=56)

    images, targets = tiny_batch(4)
    loader = [(images, targets)] * 2

    results = train(
        trainer,
        state,
        loader,
        loader,
        num_epochs=2,
        checkpoint_dir=tmp_path,
        save_frequency=2,
        compute_map=False,
    )
    assert "best_val_loss" in results and "final_train_loss" in results
    assert (tmp_path / "yolo_latest.ckpt").exists()
    assert (tmp_path / "yolo_epoch_2.ckpt").exists()
    assert (tmp_path / "yolo_best.ckpt").exists()


def test_checkpoint_roundtrip(tmp_path):
    from yolo_tpu.training import load_checkpoint, save_checkpoint

    model = tiny_model()
    tx = make_optimizer(1e-3, 0.0, milestones_steps=[])
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=56)
    losses = {"total": 1.5}
    save_checkpoint(tmp_path / "ck.ckpt", 3, state, losses, {"total": 2.0, "mAP50:95": 0.1, "mAP50": 0.2, "mAP75": 0.05})
    payload = load_checkpoint(tmp_path / "ck.ckpt")
    assert payload["epoch"] == 3
    assert payload["val_loss"] == 2.0
    assert payload["mAP50:95"] == 0.1
    restored = payload["model_state_dict"]["params"]
    orig = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(a, b)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from yolo_tpu.training.checkpoints import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    model = tiny_model()
    tx = make_optimizer(1e-4, 0.0, milestones_steps=[])
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=56)
    images, targets = tiny_batch(4)
    state, _ = trainer._train_step(state, jnp.asarray(images), jnp.asarray(targets))

    save_checkpoint_orbax(tmp_path, 1, state, {"val_loss": 3.25})

    fresh = trainer.create_state(jax.random.PRNGKey(1), image_size=56)
    restored, step, metrics = restore_checkpoint_orbax(tmp_path, fresh)
    assert step == 1
    assert metrics["val_loss"] == 3.25
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state.params)),
        jax.tree.leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(a, b)
    assert int(jax.device_get(restored.step)) == int(jax.device_get(state.step))


class FakeLoader:
    """Minimal loader stand-in: a list of batches with a batch_size attr."""

    def __init__(self, batches, batch_size):
        self.batches = batches
        self.batch_size = batch_size

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def test_validate_ragged_final_batch_on_mesh():
    # drop_last=False loaders end in a ragged batch; on a mesh this must be
    # padded to the batch size (sharding needs divisibility) and masked out of
    # the loss — the per-sample mean must match the unpadded single-device run.
    model = tiny_model()
    tx = make_optimizer(1e-4, 0.0, milestones_steps=[])
    images, targets = tiny_batch(13)  # 8 full + ragged 5 on an 8-batch loader
    batches = [(images[:8], targets[:8]), (images[8:], targets[8:])]
    loader = FakeLoader(batches, batch_size=8)

    solo = Trainer(model, tx)
    state1 = solo.create_state(jax.random.PRNGKey(0), image_size=56)
    ref = solo.validate(state1, loader)

    mesh = make_mesh(n_data=4, n_model=2)
    dp = Trainer(model, tx, mesh=mesh)
    state2 = dp.create_state(jax.random.PRNGKey(0), image_size=56)
    got = dp.validate(state2, loader)

    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=1e-6)


def test_restore_opt_state_freeze_mismatch_raises():
    from yolo_tpu.training.checkpoints import restore_opt_state

    model = tiny_model()
    tx_plain = make_optimizer(1e-3, 0.0, milestones_steps=[])
    trainer = Trainer(model, tx_plain)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=56)
    tx_frozen = make_optimizer(
        1e-3, 0.0, milestones_steps=[], freeze_backbone=True, params=state.params
    )
    opt_plain = tx_plain.init(state.params)
    opt_frozen = tx_frozen.init(state.params)

    # Save-unfrozen -> resume-frozen and the reverse both fail loudly.
    with pytest.raises(ValueError, match="freeze-backbone"):
        restore_opt_state(opt_frozen, jax.device_get(opt_plain))
    with pytest.raises(ValueError, match="freeze-backbone"):
        restore_opt_state(opt_plain, jax.device_get(opt_frozen))

    # Matching structures round-trip exactly.
    restored = restore_opt_state(opt_plain, jax.device_get(opt_plain))
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(opt_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_metrics_persist_best_tracking(tmp_path):
    from yolo_tpu.training import train
    from yolo_tpu.training.checkpoints import restore_checkpoint_orbax

    model = tiny_model()
    tx = make_optimizer(1e-3, 0.0, milestones_steps=[])
    trainer = Trainer(model, tx)
    state = trainer.create_state(jax.random.PRNGKey(0), image_size=56)
    images, targets = tiny_batch(4)
    loader = [(images, targets)] * 2
    train(
        trainer, state, loader, loader, num_epochs=1,
        checkpoint_dir=tmp_path, save_frequency=5, use_orbax=True,
    )
    fresh = trainer.create_state(jax.random.PRNGKey(1), image_size=56)
    _, step, metrics = restore_checkpoint_orbax(tmp_path, fresh)
    assert step == 1
    assert "best_val_loss" in metrics and "best_map" in metrics
    assert metrics["best_val_loss"] == metrics["val_loss"]
