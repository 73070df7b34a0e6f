"""Optimizer factory: optax chains matching the reference's torch optimizers.

Reference: /root/reference/optim/optimizer.py:142-168 builds torch SGD
(momentum, coupled weight decay, nesterov) or RMSprop. Here the same
semantics are optax chains fused into the jit'd train step:

* coupled weight decay == ``optax.add_decayed_weights`` *before* the
  momentum transform (torch adds wd·param to the gradient first);
* torch nesterov (update = g + μ·buf, buf = μ·buf + g) == optax
  ``trace(decay=μ, nesterov=True)``;
* RMSprop alpha=0.99/eps=1e-8 torch defaults (optax puts eps inside the
  sqrt; difference is O(eps) and irrelevant at lr≤0.1).

The learning rate is injected per-step via ``optax.inject_hyperparams`` so a
host-side controller (plateau) or a traced schedule can set it without
recompilation. The reference passes the frozen gallery parameters to the
optimizer too (main.py:126 — a defect per SURVEY.md §7); here only probe
parameters are optimized.
"""

from __future__ import annotations

import optax

from vlsfr_tpu.config import OptimConfig


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """Build the optax transform; learning_rate is an injected hyperparam."""

    def build(learning_rate):
        parts = []
        if cfg.grad_clip > 0:
            parts.append(optax.clip_by_global_norm(cfg.grad_clip))
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        if cfg.optim == "SGD":
            if cfg.momentum:
                parts.append(optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov))
        elif cfg.optim == "RMSprop":
            parts.append(optax.scale_by_rms(decay=0.99, eps=1e-8))
            if cfg.momentum:
                parts.append(optax.trace(decay=cfg.momentum, nesterov=False))
        else:
            raise ValueError(f"optim must be SGD or RMSprop, got {cfg.optim!r}")
        parts.append(optax.scale_by_learning_rate(learning_rate))  # includes the -1
        return optax.chain(*parts)

    return optax.inject_hyperparams(build)(learning_rate=cfg.lr)


def set_learning_rate(opt_state, lr):
    """Return opt_state with the injected learning rate replaced (jit-safe)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
