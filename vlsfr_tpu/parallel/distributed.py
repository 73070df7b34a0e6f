"""Multi-host initialization + topology helpers.

The reference has no distributed backend at all (SURVEY.md §2.4). For
multi-host TPU pods, JAX's runtime handles the coordination plane; this
module wraps the one-time setup and exposes the local/global topology the
trainer needs (per-host batch slicing, lead-host-only logging/checkpoint
metadata).

Single host (including the 8-device virtual CPU mesh used in tests) needs
no initialization — every helper degrades to the trivial answer.
"""

from __future__ import annotations

import os

import jax


def initialize_multihost(coordinator: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host pod.

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env). Returns True if a multi-process runtime
    was initialized, False when single-process (no-op).

    The multi-vs-single decision is made from explicit args / env vars ONLY,
    before any JAX backend query: calling ``jax.process_count()`` first would
    initialize the local backend and make the subsequent
    ``jax.distributed.initialize()`` fail on a real pod.
    """
    env_says_multi = any(
        os.environ.get(k) for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator is None and num_processes is None and not env_says_multi:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def is_lead_host() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """The slice of the global batch this host should feed (per-host data
    loading for multi-host DP)."""
    n = jax.process_count()
    assert global_batch % n == 0, f"global batch {global_batch} % {n} hosts != 0"
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
