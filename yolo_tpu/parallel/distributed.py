"""Multi-host initialization (replaces the reference's Modal remote dispatch).

The reference's "distributed training" is a Modal `.remote()` call to one GPU
(reference train.py:346-349). The TPU-native equivalent is
``jax.distributed.initialize()`` per host plus a global mesh over all chips;
for a single v5e-8 slice nothing crosses DCN and this is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-host; no-op single-host.

    Honors the standard JAX env vars when args are omitted; safe to call
    unconditionally from the CLIs.
    """
    import jax

    if num_processes is None and "JAX_NUM_PROCESSES" not in os.environ:
        if coordinator_address is None:
            return  # single-host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as exc:  # already initialized / single host
        print(f"jax.distributed.initialize skipped: {exc}")
