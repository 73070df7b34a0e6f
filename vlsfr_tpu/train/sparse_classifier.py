"""Sparse classifier updates for sampled partial-FC training.

Measured on v5e (docs/PERF.md): partial-FC *sampling* alone doesn't beat the
streaming full softmax at 1M identities because the dense SGD-momentum
update still reads+writes the whole [C, D] classifier and its momentum
(~12 GB of HBM traffic/step at 1M×512). This module completes the
Partial-FC recipe (arXiv 2010.05222): only the step's sampled rows are
gathered, updated with torch-SGD semantics (coupled weight decay +
momentum + optional nesterov), and scattered back — O(S·D) traffic.

The visit-age momentum catch-up (``last_visit``/``step``): a dense
SGD-momentum row receives ``lr/(1-μ)`` total displacement per gradient
event (the momentum tail keeps moving the row for ~1/(1-μ) steps). A naive
sparse update applies only ``lr`` at the visit — sparsely-visited rows run
at an order of magnitude lower effective learning rate, which the accuracy
study measured as total failure to learn (docs/PERF.md). With a per-row
last-visit step, each visit first replays the EXACT geometric tail the
dense trajectory would have applied during the gap (assuming zero gradient
while unvisited — precisely the truncation's premise), decays the momentum
by μ^gap, then takes the normal step. With that, the sparse trajectory
equals the dense one whenever unvisited rows' true gradients are zero
(unit-tested), and the only remaining approximations are:

* the dropped tiny gradients themselves;
* untouched rows skip coupled weight decay during the gap (wd·lr per step
  is O(1e-5) — negligible over realistic gaps);
* the replayed tail is applied at the CURRENT lr, not the per-step lr the
  dense trajectory used during the gap. Under a smooth schedule this is
  exact to first order; across a multistep lr DROP, tail displacement
  earned before the drop is replayed at the post-drop lr — i.e. the
  catch-up under-applies by at most ``(lr_old − lr_new)·Σμ^i·m0`` for the
  pre-drop fraction of the gap. With μ=0.9 the tail is ~10 steps long, so
  only gaps that straddle a milestone within ~10 steps are affected at
  all, and the under-applied displacement is bounded by one pre-drop
  update — quantified in tests/test_sparse_classifier.py
  (test_lr_drop_mid_gap_bounded_deviation). A schedule-aware replay would
  need the full lr history per gap (O(steps) state) for a correction that
  is zero almost everywhere — deliberately not implemented.

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
    last_visit: jnp.ndarray | None = None,
    step=None,
) -> tuple:
    """torch-SGD step applied only to ``w[idx]`` (see optim/optimizers.py for
    the dense-parity semantics). ``idx`` entries must be unique; entries
    ≥ len(w) are dropped.

    With ``last_visit`` ([C] int32, last step each row was updated) and the
    current ``step``, performs the visit-age momentum catch-up (module
    docstring) and returns (new_w, new_momentum_buf, new_last_visit);
    without them, the plain stale-momentum update, returning
    (new_w, new_momentum_buf)."""
    safe = jnp.minimum(idx, w.shape[0] - 1)  # gather-safe; OOB rows dropped below
    # math in f32 regardless of storage dtype (bf16 classifiers supported)
    w_sub = w[safe].astype(jnp.float32)
    m_sub = momentum_buf[safe].astype(jnp.float32)
    mu = momentum
    catchup = 0.0
    if last_visit is not None:
        # gap = zero-gradient steps the dense trajectory took between visits
        gap = jnp.maximum(step - last_visit[safe] - 1, 0).astype(jnp.float32)[:, None]
        if mu > 0.0:
            # dense would have applied Σ_{i=1..gap} μ^i·m0 (plus one more μ
            # factor under nesterov) and decayed m to μ^gap·m0
            geo = mu * (1.0 - mu**gap) / (1.0 - mu)
            catchup = (mu * geo if nesterov else geo) * m_sub
            m_sub = (mu**gap) * m_sub
    g = grad_rows.astype(jnp.float32) + weight_decay * w_sub
    m_new = mu * m_sub + g
    update = g + mu * m_new if nesterov else m_new
    new_w = w.at[idx].add((-lr * (update + catchup)).astype(w.dtype), mode="drop")
    new_m = momentum_buf.at[idx].set(m_new.astype(momentum_buf.dtype), mode="drop")
    if last_visit is None:
        return new_w, new_m
    new_last = last_visit.at[idx].set(
        jnp.broadcast_to(jnp.asarray(step, last_visit.dtype), idx.shape), mode="drop"
    )
    return new_w, new_m, new_last
