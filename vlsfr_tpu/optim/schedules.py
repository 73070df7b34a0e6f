"""Learning-rate schedules with fractional-epoch warmup.

Re-implements the reference's scheduler family
(/root/reference/optim/optimizer.py:6-128) as pure jnp functions of the
global step — fully jit-compatible (the reference mutates optimizer
param_groups from Python each iteration, main.py:39-40).

Shared warmup semantics (optimizer.py:63,87,105,126): while
``epoch < warmup_epochs``,  lr = (epoch + iter_frac) / warmup_epochs · base.
After warmup, each policy is a function of ``last_epoch = epoch − warmup``:

* cos          — eta_min + (base − eta_min)(1 + cos(π·last/T_max))/2,
                 clamping to eta_min past max_epochs (optimizer.py:54-66)
* multistep    — base · Π gammas[:bisect_right(milestones, last)]
                 (optimizer.py:77-89)
* exponential  — base · gamma^last (optimizer.py:97-107)
* linear       — base · (1 − (max−min)·last/(epochs·max)) (optimizer.py:117-128)
* plateau      — handled host-side by :class:`PlateauController` (the
                 reference delegates to torch ReduceLROnPlateau,
                 optimizer.py:164-165); the schedule itself is constant-base.

All policies use the *integer* epoch after warmup, exactly like the
reference (its per-iteration update only matters inside warmup).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from vlsfr_tpu.config import OptimConfig


def make_schedule(cfg: OptimConfig, steps_per_epoch: int) -> Callable:
    """Returns ``lr(step) -> float32`` usable both traced and host-side."""
    spe = max(int(steps_per_epoch), 1)
    base = float(cfg.lr)
    warmup = int(cfg.warmup_epochs)
    epochs = int(cfg.epochs)
    name = cfg.scheduler

    if name == "multistep":
        milestones = np.asarray(cfg.milestones, dtype=np.int32)
        factors = np.cumprod(np.concatenate([[1.0], np.asarray(cfg.gammas, dtype=np.float64)]))
        factors = jnp.asarray(factors, dtype=jnp.float32)

        def post(last_epoch, _frac):
            idx = jnp.searchsorted(jnp.asarray(milestones), last_epoch, side="right")
            return base * factors[idx]

    elif name == "cos":
        t_max = float(cfg.t_max if cfg.t_max > 0 else epochs)
        eta_min = float(cfg.eta_min)

        def post(last_epoch, _frac):
            cosine = eta_min + (base - eta_min) * (1 + jnp.cos(jnp.pi * last_epoch / t_max)) / 2
            return jnp.where(last_epoch + warmup >= epochs, eta_min, cosine)

    elif name == "exponential":
        gamma = float(cfg.gamma)

        def post(last_epoch, _frac):
            return base * jnp.power(gamma, last_epoch.astype(jnp.float32))

    elif name == "linear":
        max_lr, min_lr = float(cfg.lr), float(cfg.lr_min)

        def post(last_epoch, _frac):
            ratio = (max_lr - min_lr) * last_epoch.astype(jnp.float32) / epochs / max_lr
            return base * (1.0 - ratio)

    elif name == "plateau":

        def post(last_epoch, _frac):
            return jnp.asarray(base, jnp.float32)

    else:
        raise ValueError(f"unknown scheduler {name!r}")

    def schedule(step):
        step = jnp.asarray(step)
        epoch = step // spe
        frac = (step % spe).astype(jnp.float32) / spe
        in_warmup = epoch < warmup
        warm = (epoch.astype(jnp.float32) + frac) / max(warmup, 1) * base
        return jnp.where(in_warmup, warm, post(jnp.maximum(epoch - warmup, 0), frac)).astype(
            jnp.float32
        )

    return schedule


class PlateauController:
    """Host-side ReduceLROnPlateau (torch semantics: mode=min, factor,
    relative threshold 1e-4, patience, min_lr floor).

    The trainer feeds it the loss at the reference's observation cadence
    (every ``print_freq`` real iterations, main.py:76-82) and multiplies the
    base schedule by :attr:`scale`.
    """

    def __init__(self, factor: float = 0.1, patience: int = 10, min_lr: float = 0.0,
                 threshold: float = 1e-4, base_lr: float = 0.1):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.base_lr = base_lr
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def observe(self, loss: float) -> float:
        if loss < self.best * (1.0 - self.threshold):
            self.best = loss
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                new_scale = max(self.scale * self.factor, self.min_lr / max(self.base_lr, 1e-12))
                self.scale = new_scale
                self.num_bad = 0
        return self.scale

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad": self.num_bad, "scale": self.scale}

    def load_state_dict(self, d: dict) -> None:
        self.best, self.num_bad, self.scale = d["best"], d["num_bad"], d["scale"]
