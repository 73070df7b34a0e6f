"""Momentum-storage dtype study for the fused-SGD streaming head.

At C=1M, D=512, bf16 classifier the fused backward+update moves ~7 GB:
w read ×2 (fwd+bwd) + w write = 3 GB bf16, momentum read+write = 4 GB
f32. Storing momentum bf16 halves the momentum traffic (−2 GB/step) at
the cost of ~8-bit mantissa rounding on the accumulated trace — this
tool measures the THROUGHPUT side on the real chip (single-chip fused
head, donated state, value-fetch sync); the trajectory-fidelity side is
tests/test_fused_update.py::test_fused_update_mom_bf16 (CPU oracle
drift bound) + the accuracy note in docs/PERF.md.

Run on the real chip: python tools/bench_mom_dtype.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")

B, D, C = 128, 512, 1 << 20
SGD = dict(momentum=0.9, nesterov=True, weight_decay=5e-4)
LOSS = dict(loss_type="Arc", margin=0.5, scale=32.0, mask_svfc=1.2,
            normalize_w=True)


def main():
    from vlsfr_tpu.ops.margin_pallas import streaming_margin_grads_fused_sgd

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((B, D)).astype(np.float32)
    emb = jnp.asarray(emb / np.linalg.norm(emb, axis=-1, keepdims=True))
    labels = jnp.asarray(rng.integers(0, C, B).astype(np.int32))

    @partial(jax.jit, static_argnums=(1, 2))
    def init(key, wdt, mdt):
        w = (jax.random.normal(key, (C, D), jnp.float32) * 0.01).astype(wdt)
        return w, jnp.zeros((C, D), mdt)

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(emb, w, mom, labels, lr):
        d_ce = jnp.full((B,), 1.0 / B, jnp.float32)
        d_neg = jnp.zeros((B,), jnp.float32)
        ce, _neg, topk, gt, d_emb, new_w, new_mom = (
            streaming_margin_grads_fused_sgd(
                emb, w, mom, labels, d_ce, d_neg, lr, hard_neg=1,
                **SGD, **LOSS))
        return jnp.mean(ce) + 1e-30 * jnp.sum(d_emb), new_w, new_mom

    results = {}
    for mdt in (jnp.float32, jnp.bfloat16):
        w, mom = init(jax.random.PRNGKey(1), jnp.bfloat16, mdt)
        loss, w, mom = step(emb, w, mom, labels, 0.05)  # compile+warm
        print(f"mom={jnp.dtype(mdt).name}: first loss={float(loss):.6f}",
              flush=True)
        n = 30
        t0 = time.time()
        for _ in range(n):
            loss, w, mom = step(emb, w, mom, labels, 0.05)
        _ = float(loss)
        dt = (time.time() - t0) / n * 1e3
        results[jnp.dtype(mdt).name] = dt
        print(f"mom={jnp.dtype(mdt).name}: {dt:.2f} ms/iter "
              f"(loss after {n + 1} steps: {float(loss):.6f})", flush=True)
    f32, bf16 = results["float32"], results["bfloat16"]
    print(f"bf16 momentum: {f32 / bf16:.3f}x over f32 "
          f"({f32 - bf16:.2f} ms/step saved)", flush=True)


if __name__ == "__main__":
    main()
