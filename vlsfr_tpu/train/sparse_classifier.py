"""Sparse classifier updates for sampled partial-FC training.

Measured on v5e (docs/PERF.md): partial-FC *sampling* alone doesn't beat the
streaming full softmax at 1M identities because the dense SGD-momentum
update still reads+writes the whole [C, D] classifier and its momentum
(~12 GB of HBM traffic/step at 1M×512). This module completes the
Partial-FC recipe (arXiv 2010.05222): only the step's sampled rows are
gathered, updated with torch-SGD semantics (coupled weight decay +
momentum + optional nesterov), and scattered back — O(S·D) traffic.

Approximations (standard for sparse-momentum training, documented):

* untouched rows receive no weight decay and no momentum decay this step
  (their momentum is simply stale, applied implicitly when next sampled).

Callers pass UNIQUE indices (partial_fc.sample_classes dedups; the sparse
streaming backward emits distinct tiles), with duplicates/padding routed to
the out-of-bounds sentinel ``idx == num_rows`` — those positions are dropped
by the scatters, so there is no duplicate-momentum ambiguity.
"""

from __future__ import annotations

import jax.numpy as jnp


def sparse_sgd_rows(
    w: jnp.ndarray,
    momentum_buf: jnp.ndarray,
    idx: jnp.ndarray,
    grad_rows: jnp.ndarray,
    *,
    lr,
    momentum: float,
    weight_decay: float,
    nesterov: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torch-SGD step applied only to ``w[idx]`` (see optim/optimizers.py for
    the dense-parity semantics). ``idx`` entries must be unique; entries
    ≥ len(w) are dropped. Returns (new_w, new_momentum_buf)."""
    safe = jnp.minimum(idx, w.shape[0] - 1)  # gather-safe; OOB rows dropped below
    # math in f32 regardless of storage dtype (bf16 classifiers supported)
    w_sub = w[safe].astype(jnp.float32)
    m_sub = momentum_buf[safe].astype(jnp.float32)
    g = grad_rows.astype(jnp.float32) + weight_decay * w_sub
    m_new = momentum * m_sub + g
    update = g + momentum * m_new if nesterov else m_new
    new_w = w.at[idx].add((-lr * update).astype(w.dtype), mode="drop")
    new_m = momentum_buf.at[idx].set(m_new.astype(momentum_buf.dtype), mode="drop")
    return new_w, new_m
