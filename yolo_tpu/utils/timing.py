"""Device-time measurement helpers (profiler-trace based).

The axon TPU attaches over a tunnel: wall clocks include ~200 ms RTT and
``block_until_ready`` can acknowledge before execution finishes. The only
trustworthy timing is the DEVICE duration of compiled-program executions from
a ``jax.profiler`` trace (bench.py's methodology, factored here for reuse by
tools/ and experiments/).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile


def _module_device_us(trace_dir: str, prefix: str = "jit") -> float:
    files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return 0.0
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    return sum(
        e["dur"]
        for e in events
        if e.get("ph") == "X"
        and "TPU" in pids.get(e.get("pid"), "")
        and e.get("name", "").startswith(prefix)
    )


def device_time_ms(fn, *args, iters: int = 6, tag: str = "op") -> float:
    """Mean device ms/iteration of ``fn(*args)`` (fn must be jitted).

    Compiles/warms up once outside the trace, then records ``iters``
    executions and sums the TPU-side durations of all jit programs. A host
    fetch of the output forces completion inside the trace window.
    """
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = os.path.join(
        tempfile.gettempdir(), f"yolo_tpu_devtime_{tag}_{os.getpid()}"
    )
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
            # Block per iteration: device-time sums ignore host gaps, and
            # letting un-consumed outputs pile up OOMs the chip (the tunnel
            # backend frees dropped buffers lazily).
            jax.block_until_ready(out)
    # Force/verify completion OUTSIDE the trace: the reduction program over a
    # large output would otherwise be counted into the measurement (observed:
    # +2.3 ms/iter on a 0.8 GB output at iters=4).
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
    total_us = _module_device_us(trace_dir)
    return total_us / 1e3 / iters
