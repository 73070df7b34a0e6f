"""Structured training metrics: stdout + JSONL + optional TensorBoard.

The reference computes loss/lr/ETA every 1000 iters and then prints nothing
(SURVEY.md §5 "observability: minimal" — values feed only the plateau
scheduler and the checkpoint name, main.py:76-85). Here every window emits a
structured record: loss components, lr, pool hit-rate, images/sec/chip (the
BASELINE north-star metric), grad norm.
"""

from __future__ import annotations

import json
import logging
import os
import time

logger = logging.getLogger("vlsfr")
if not logger.handlers:
    h = logging.StreamHandler()
    h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%H:%M:%S"))
    logger.addHandler(h)
    logger.setLevel(logging.INFO)


class Throughput:
    """images/sec (/chip) over a rolling window."""

    def __init__(self, num_chips: int = 1):
        self.num_chips = max(num_chips, 1)
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, n_images: int):
        self._images += n_images

    def value(self) -> tuple[float, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        ips = self._images / dt
        return ips, ips / self.num_chips


class MetricsLogger:
    def __init__(self, log_dir: str = "", tensorboard: bool = False):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if tensorboard and log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:  # pragma: no cover - TB optional
                logger.warning("tensorboard unavailable; JSONL/stdout only")

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        scalars = {k: float(v) for k, v in metrics.items()}
        parts = " ".join(
            f"{k}={v:.4g}" if abs(v) < 1e5 else f"{k}={v:.3e}" for k, v in scalars.items()
        )
        logger.info("step %d | %s", step, parts)
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, "prefix": prefix, **scalars}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
