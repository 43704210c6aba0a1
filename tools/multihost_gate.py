"""Executed 2-process ``jax.distributed`` gate (CPU, gloo collectives).

The reference's only "distributed" story is a Modal ``.remote()`` dispatch to
one GPU (reference src/train.py:346-349); SURVEY §2.2 sets the TPU obligation
as ``jax.distributed`` + a global mesh. This gate EXECUTES every
multi-process branch of that obligation on one host — the branches that were
dead code in all prior testing:

- ``parallel.distributed.initialize_distributed``: real 2-process
  coordinator handshake (gloo CPU collectives).
- ``data.loader.DataLoader(shard_by_process=True)``: each process loads its
  disjoint strided slice of an identically-shuffled index stream
  (data/loader.py:186-193).
- ``parallel.mesh.put_sharded``'s ``jax.make_array_from_process_local_data``
  branch (parallel/mesh.py:56-58): per-host batches assembled into one
  global array over a mesh whose 'data' axis crosses the process boundary.
- the PRODUCTION ``Trainer._train_step`` (training/trainer.py) jitted over
  that global (data=2, model=2) mesh — DP grad all-reduce rides gloo across
  processes, TP (fc1 column / fc2 row) stays intra-process.
- ``mAPMetric.update``'s ``process_allgather`` branch (metrics/map.py:174-184)
  + ``compute``: each process accumulates only its local slice's predictions,
  and the gather guarantees both processes compute the FULL-dataset mAP —
  the invariant that keeps best-mAP checkpoint decisions from diverging.

Run modes:
  parent (default):  python tools/multihost_gate.py
      spawns the two children, awaits both, asserts their result lines are
      identical and finite, prints one summary JSON line, exit 0/1.
  child (internal):  python tools/multihost_gate.py --process-id N \
                         --coordinator localhost:PORT

The model is the compute-light probe (CLAUDE.md trap 7: XLA:CPU idle Eigen
workers busy-spin on 1-core hosts, so executed virtual-mesh steps must stay
in the few-ops regime); multi-process correctness — sharding assembly,
collectives, loader slicing, metric gathering — is model-agnostic.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROCESSES = 2
DEVICES_PER_PROCESS = 2
DATASET_SIZE = 16
PER_HOST_BATCH = 4  # global batch = 8 over data axis = 2
IMAGE_SIZE = 64
RESULT_TAG = "MHGATE_RESULT "


# --------------------------------------------------------------------- child
class _SyntheticDetDataset:
    """Tiny deterministic map-style dataset: content derives only from idx.

    Every process constructs the identical dataset; the loader's
    ``shard_by_process`` slicing is what makes their iterated samples
    disjoint.
    """

    def __init__(self, n: int, image_size: int, S: int = 7, C: int = 20):
        self.n = n
        self.image_size = image_size
        self.S = S
        self.C = C

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int):
        import numpy as np

        rng = np.random.default_rng(1234 + idx)
        image = rng.uniform(-1, 1, (self.image_size, self.image_size, 3))
        target = np.zeros((self.S, self.S, 10 + self.C), np.float32)
        ci, cj = idx % self.S, (3 * idx + 1) % self.S
        target[ci, cj, 0:5] = [0.5, 0.5, 0.15 + 0.01 * idx, 0.2, 1.0]
        target[ci, cj, 10 + (idx % self.C)] = 1.0
        return image.astype(np.float32), target


def child_main(process_id: int, coordinator: str) -> None:
    # XLA_FLAGS must be final before jax touches a backend.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (
            flags
            + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
        ).strip()
    os.environ["XLA_FLAGS"] = flags

    import jax

    # The sitecustomize pins jax_platforms="axon,cpu"; this gate is CPU-only
    # (and must never open a second TPU client — CLAUDE.md trap 4).
    jax.config.update("jax_platforms", "cpu")
    # Fresh per-run compile cache: the multichip gates never reuse caches
    # (foreign XLA:CPU AOT blobs from fingerprint-aliased fleet hosts SIGILL;
    # CLAUDE.md trap 9).
    import atexit
    import shutil
    import tempfile

    cache_dir = tempfile.mkdtemp(prefix=f"jax_cache_mhgate_p{process_id}_")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    atexit.register(shutil.rmtree, cache_dir, ignore_errors=True)

    sys.path.insert(0, REPO)
    from yolo_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=N_PROCESSES,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROCESSES, jax.process_count()
    assert jax.device_count() == N_PROCESSES * DEVICES_PER_PROCESS
    assert jax.local_device_count() == DEVICES_PER_PROCESS

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from yolo_tpu.data.loader import DataLoader
    from yolo_tpu.metrics import mAPMetric
    from yolo_tpu.models import Backbone, YOLOv1
    from yolo_tpu.models.heads import SimpleHead
    from yolo_tpu.parallel import make_mesh
    from yolo_tpu.training import Trainer, make_optimizer

    # Global (data=2, model=2) mesh: jax.devices() orders process 0's devices
    # first, so reshape(2, 2) puts the 'data' axis ACROSS the process
    # boundary (DP grad all-reduce crosses gloo) and 'model' within a
    # process (TP collectives stay local).
    mesh = make_mesh(n_data=2, n_model=2)
    data_rows = np.asarray(mesh.devices)
    assert {d.process_index for d in data_rows[process_id]} == {process_id}, (
        "mesh 'data' axis does not align with the process boundary"
    )

    class _ProbeBackbone(Backbone):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.avg_pool(x, (4, 4), strides=(4, 4))
            x = nn.Conv(16, (3, 3), padding=1, name="conv1")(x)
            x = jnp.where(x > 0, x, 0.1 * x)
            return nn.Conv(32, (3, 3), padding=1, name="conv2")(x)

    model = YOLOv1(
        num_classes=20, S=7, B=2, backbone=_ProbeBackbone(),
        detection_head=SimpleHead(num_classes=20, S=7, B=2),
    )
    tx = make_optimizer(1e-4, 5e-4, milestones_steps=[100], decay_factor=0.1)
    trainer = Trainer(model, tx, mesh=mesh)
    state = trainer.create_state(
        jax.random.PRNGKey(0), image_size=IMAGE_SIZE, init_batch=1
    )

    # Production sharded loader: identical shuffle everywhere (seeded),
    # disjoint per-process strided slices.
    dataset = _SyntheticDetDataset(DATASET_SIZE, IMAGE_SIZE)
    loader = DataLoader(
        dataset,
        batch_size=PER_HOST_BATCH,
        shuffle=True,
        num_workers=0,
        seed=7,
        shard_by_process=True,
    )
    n_local = len(loader)
    assert n_local == DATASET_SIZE // N_PROCESSES // PER_HOST_BATCH, n_local

    # --- one PRODUCTION train step per local batch --------------------------
    losses = []
    for images, targets in loader:
        g_images, g_targets = trainer.put_batch(images, targets)
        assert g_images.shape[0] == PER_HOST_BATCH * N_PROCESSES, g_images.shape
        state, parts = trainer._train_step(state, g_images, g_targets)
        losses.append(float(jax.device_get(parts["total"])))
    assert all(l == l and l > 0 for l in losses), losses

    # --- one mAP round over the full (sharded) dataset ----------------------
    # Each process decodes only ITS loader slice's predictions; update()'s
    # process_allgather hands both processes the full dataset, so compute()
    # must agree exactly.
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    fwd = jax.jit(
        lambda img: model.apply(
            {"params": params, "batch_stats": batch_stats}, img, train=False
        )
    )
    metric = mAPMetric(num_classes=20, iou_thresholds=0.5)
    n_images_local = 0
    for images, targets in loader:
        preds = np.array(jax.device_get(fwd(jnp.asarray(images))))  # writable copy
        # A target tensor is a valid prediction tensor (same layout, slot-0
        # conf 1.0): substitute it for half of each local batch so the
        # gathered set contains real true positives — the cross-process mAP
        # agreement below is then about NONZERO values that depend on both
        # processes' disjoint data, not trivially 0 == 0.
        half = preds.shape[0] // 2
        preds[:half] = targets[:half]
        metric.update(preds, targets)
        n_images_local += images.shape[0]
    results = metric.compute()

    out = {
        "process": process_id,
        "n_local_batches": n_local,
        "n_images_local": n_images_local,
        "losses": [round(l, 6) for l in losses],
        "mAP50": round(float(results["mAP50"]), 10),
        "precision": round(float(results["precision"]), 10),
        "recall": round(float(results["recall"]), 10),
    }
    print(RESULT_TAG + json.dumps(out), flush=True)


# -------------------------------------------------------------------- parent
def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def parent_main(timeout: float) -> int:
    import tempfile

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count
    procs = []
    logs = []
    for pid in range(N_PROCESSES):
        # File-backed stdout: the parent reaps the children SEQUENTIALLY, so
        # a PIPE would deadlock the gate if the not-yet-reaped child filled
        # its ~64 KB pipe buffer with XLA/absl logging while the reaped one
        # waited for it inside a cross-process collective.
        log = tempfile.TemporaryFile(mode="w+", encoding="utf-8",
                                     errors="replace")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--process-id",
                    str(pid),
                    "--coordinator",
                    f"localhost:{port}",
                ],
                stdout=log,
                stderr=subprocess.STDOUT,
                env=env,
                cwd=REPO,
            )
        )
    deadline = time.time() + timeout
    outputs = []
    ok = True
    for pid, proc in enumerate(procs):
        timed_out = False
        try:
            proc.wait(timeout=max(1.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            timed_out = True
            ok = False
        logs[pid].seek(0)
        out = logs[pid].read()
        logs[pid].close()
        if timed_out:
            out += "\n<TIMEOUT>"
        outputs.append(out)
        if proc.returncode != 0:
            ok = False

    results = []
    for pid, out in enumerate(outputs):
        line = next(
            (l for l in out.splitlines() if l.startswith(RESULT_TAG)), None
        )
        if line is None:
            ok = False
            sys.stderr.write(f"--- process {pid} output (no result line) ---\n")
            sys.stderr.write(out[-4000:] + "\n")
            continue
        results.append(json.loads(line[len(RESULT_TAG):]))

    summary = {"gate": "multihost_2proc", "ok": False}
    if ok and len(results) == N_PROCESSES:
        p0, p1 = results
        agree = (
            p0["losses"] == p1["losses"]
            and p0["mAP50"] == p1["mAP50"]
            and p0["precision"] == p1["precision"]
            and p0["recall"] == p1["recall"]
        )
        covered_all = (
            p0["n_images_local"] + p1["n_images_local"] == DATASET_SIZE
        )
        # Half of each batch carries injected perfect predictions, so a
        # correct full-dataset gather must show recall > 0 (vacuous-agreement
        # guard).
        nonzero = p0["recall"] > 0
        summary.update(
            ok=bool(agree and covered_all and nonzero),
            agree=agree,
            covered_all_images=covered_all,
            losses=p0["losses"],
            mAP50=p0["mAP50"],
            precision=p0["precision"],
            recall=p0["recall"],
            n_images_per_process=[
                p0["n_images_local"], p1["n_images_local"]
            ],
        )
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()
    if args.process_id is not None:
        child_main(args.process_id, args.coordinator)
        return 0
    return parent_main(args.timeout)


if __name__ == "__main__":
    sys.exit(main())
