"""Int8 storage for the DCP queue (``pool.queue_dtype = "int8"``).

The FFC queue (reference ffc.py:29-30) holds L2-normalized gallery
embeddings that the fused head streams twice per step (fwd + bwd — the
4.9 ms/step HBM floor at Q=1M f32 on v5e, docs/PERF.md). Rows are only
ever REPLACED whole by the LRU admission scatter, never accumulated, so
storing them int8 with a per-row scale:

  * cuts the streaming floor 4x vs f32 / 2x vs bf16 (the head is pure
    queue DMA at Q >> B);
  * roughly doubles the largest pool one chip can hold (a 10M-slot
    [2, Q, 512] queue is 10.2 GB int8 vs 20.5 GB f32 — BASELINE config
    5's identity count on ONE v5e);
  * never compounds: each write is a fresh quantization of the current
    full-precision gallery embedding, and this step's loss views use the
    exact (pre-quantization) written values — the rounding is only seen
    by LATER steps that re-read the slot, mirroring how bf16 queues
    already behave.

Scale convention: ``scale = 1/||q_int||_2`` so the dequantized row
``q_int * scale`` is EXACTLY unit-norm (f32 rounding aside) — the margin
head's cosine contract (reference ffc.py:195 relies on normalized rows).
Only the row's *direction* carries quantization error: ~4e-5 expected
cosine drift at D=512 (see tests/test_qqueue.py for the measured bound).
"""

from __future__ import annotations

import jax.numpy as jnp

# absmax -> int8 mapping; 127 keeps the mapping symmetric (-127..127)
_QMAX = 127.0


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization of ``x[..., D]``.

    Returns ``(q int8[..., D], scale f32[...])`` with
    ``q * scale[..., None]`` exactly unit-norm per row (zero rows map to
    scale 0). The input's own norm is deliberately discarded — queue rows
    are unit-norm by contract, and renormalizing through the scale removes
    the norm component of the quantization error entirely.
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    q = jnp.round(x32 / jnp.maximum(absmax, 1e-30) * _QMAX)
    q = jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)
    nrm = jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1))
    scale = jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
    return q, scale


def dequant_rows(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """f32 rows from ``quantize_rows`` output; unit-norm where scale > 0."""
    return q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)


def is_int8_queue(queue) -> bool:
    return queue.dtype == jnp.int8
