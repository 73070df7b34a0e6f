#!/usr/bin/env python
"""Benchmark: FFC training throughput on the flagship config, single chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``value`` is trained images/sec/chip for the full FFC step (4 backbone
passes — probe+gallery over both batch halves — backward through the probe
passes, DCP scatter, twin cosine heads, margin-softmax loss, SGD update).
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` reports fraction-of-roofline (model FLOPs utilization):
achieved FLOPs/sec ÷ chip peak bf16 FLOPs/sec, where step FLOPs come from
XLA's own cost analysis of the compiled step. The BASELINE.json north star
is ≥0.90.

Env overrides: BENCH_BATCH (128), BENCH_QUEUE (16384), BENCH_NET (ir50),
BENCH_STEPS (20).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


# chip peak dense bf16 FLOPs/sec by device kind (public specs)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "cpu": 1e12,  # nominal, so CPU runs still report something
}


def main():
    import jax
    import jax.numpy as jnp

    from vlsfr_tpu.config import Config
    from vlsfr_tpu.core.dcp import DCPManager
    from vlsfr_tpu.core.ffc import create_ffc_state, make_train_step
    from vlsfr_tpu.models import create_net, native_image_size
    from vlsfr_tpu.optim import make_optimizer, make_schedule

    batch = int(os.environ.get("BENCH_BATCH", 128))
    queue_size = int(os.environ.get("BENCH_QUEUE", 16384))
    net_type = os.environ.get("BENCH_NET", "ir50")
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    fuse_forward = os.environ.get("BENCH_FUSE_FWD", "1") == "1"

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu")
    peak = next((v for k, v in PEAK_FLOPS.items() if k.lower() in str(kind).lower()), 1e12)

    cfg = Config()
    cfg.model.net_type = net_type
    cfg.model.feat_dim = 512
    cfg.model.dtype = "bfloat16"
    cfg.pool.queue_size = queue_size
    cfg.data.batch_size = batch
    cfg.pool.fuse_forward = fuse_forward
    size = native_image_size(net_type)

    model = create_net(net_type, feat_dim=cfg.model.feat_dim, dtype=jnp.bfloat16)
    optimizer = make_optimizer(cfg.optim)
    schedule = make_schedule(cfg.optim, steps_per_epoch=1000)
    state = create_ffc_state(jax.random.PRNGKey(0), model, cfg, optimizer, size)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((batch, size, size, 3)), jnp.float32)
    mgr = DCPManager(queue_size)
    labels = rng.integers(0, 10**6, size=batch)  # 1M-identity label space
    idx = mgr.plan_step(labels, labels)

    step = jax.jit(make_train_step(model, cfg, optimizer, schedule), donate_argnums=0)
    lowered = step.lower(state, x, y, idx, 1.0)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        step_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        step_flops = 0.0

    # warmup (also materializes donation pattern)
    for _ in range(3):
        state, m = compiled(state, x, y, idx, 1.0)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = compiled(state, x, y, idx, 1.0)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    images_per_sec = steps_per_sec * 2 * batch  # 2B images trained per step
    mfu = (steps_per_sec * step_flops) / peak if step_flops else 0.0

    print(
        json.dumps(
            {
                "metric": f"ffc_{net_type}_train_images_per_sec_chip_b{batch}_q{queue_size}",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(mfu, 4),
                "detail": {
                    "device": str(kind),
                    "step_time_ms": round(1000 * dt / n_steps, 2),
                    "step_flops": step_flops,
                    "peak_flops": peak,
                    "loss": float(m["loss"]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
