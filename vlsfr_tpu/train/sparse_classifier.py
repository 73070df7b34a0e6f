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
  (their momentum is simply stale, applied implicitly when next sampled);
* duplicate sampled indices (random collisions, repeated batch labels)
  scatter-add their weight deltas but last-write momentum.
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
    the dense-parity semantics). Returns (new_w, new_momentum_buf)."""
    w_sub = w[idx]
    m_sub = momentum_buf[idx]
    g = grad_rows + weight_decay * w_sub
    m_new = momentum * m_sub + g
    update = g + momentum * m_new if nesterov else m_new
    # weight delta accumulates across duplicate indices; momentum last-wins
    new_w = w.at[idx].add(-lr * update)
    new_m = momentum_buf.at[idx].set(m_new)
    return new_w, new_m
