"""Real-chip validation + bench of the model-SHARDED fused-SGD softmax head.

parallel/sharded_fused.py at mesh=(1,1) (collectives degenerate to no-ops)
vs the single-chip fused op (ops/margin_pallas.streaming_margin_grads_
fused_sgd) on ir50 head shapes: C=1M, D=512, B=128, bf16 classifier +
f32 momentum. Checks the updated classifier/momentum agree, then times
both with the state donated and threaded through iterations (the
input_output_aliases in-place update only engages with donation —
bench.py measured 63.5 → 54.2 ms/step from exactly this).

Run in background on the real chip, no timeout:
    python tools/bench_sharded_fused.py
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
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vlsfr_tpu.ops.margin_pallas import streaming_margin_grads_fused_sgd
    from vlsfr_tpu.parallel.sharded_fused import make_sharded_fused_sgd_head

    print("device:", jax.devices()[0], flush=True)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((B, D)).astype(np.float32)
    emb = jnp.asarray(emb / np.linalg.norm(emb, axis=-1, keepdims=True))
    labels = jnp.asarray(rng.integers(0, C, B).astype(np.int32))

    @partial(jax.jit, static_argnums=1)
    def init(key, dt):
        kw, km = jax.random.split(key)
        w = (jax.random.normal(kw, (C, D), jnp.float32) * 0.01).astype(dt)
        mom = jnp.zeros((C, D), jnp.float32)
        return w, mom

    w0, mom0 = init(jax.random.PRNGKey(1), jnp.bfloat16)
    cls_sh = NamedSharding(mesh, P("model", None))
    w0 = jax.device_put(w0, cls_sh)
    mom0 = jax.device_put(mom0, cls_sh)

    head = make_sharded_fused_sgd_head(mesh, hard_neg=1, **SGD, **LOSS)

    @partial(jax.jit, donate_argnums=(1, 2))
    def step_sh(emb, w, mom, labels, lr):
        ce, _neg, topk, gt, d_emb, new_w, new_mom = head(emb, w, mom, labels, lr)
        # fold d_emb into the fetched scalar so nothing is dead code
        return jnp.mean(ce) + 1e-30 * jnp.sum(d_emb), new_w, new_mom

    @partial(jax.jit, donate_argnums=(1, 2))
    def step_si(emb, w, mom, labels, lr):
        d_ce = jnp.full((B,), 1.0 / B, jnp.float32)
        d_neg = jnp.zeros((B,), jnp.float32)
        ce, _neg, topk, gt, d_emb, new_w, new_mom = (
            streaming_margin_grads_fused_sgd(
                emb, w, mom, labels, d_ce, d_neg, lr, hard_neg=1,
                **SGD, **LOSS))
        return jnp.mean(ce) + 1e-30 * jnp.sum(d_emb), new_w, new_mom

    # equivalence on fresh state (copies — the step donates its inputs)
    for name, step in (("sharded", step_sh), ("single", step_si)):
        t0 = time.time()
        loss, w1, mom1 = step(emb, jnp.copy(w0), jnp.copy(mom0), labels, 0.05)
        loss = float(loss)
        print(f"{name}: compile+run {time.time()-t0:.1f}s loss={loss:.6f}",
              flush=True)
        if name == "sharded":
            w_sh, mom_sh, loss_sh = w1, mom1, loss
        else:
            dw = float(jnp.max(jnp.abs(w_sh.astype(jnp.float32)
                                       - w1.astype(jnp.float32))))
            dm = float(jnp.max(jnp.abs(mom_sh - mom1)))
            print(f"  |loss diff|={abs(loss_sh - loss):.2e} "
                  f"max|dW|={dw:.2e} max|dmom|={dm:.2e}", flush=True)

    # timed: thread donated state (in-place aliasing engaged), value-fetch
    for name, step in (("sharded", step_sh), ("single", step_si)):
        w, mom = jnp.copy(w0), jnp.copy(mom0)
        loss, w, mom = step(emb, w, mom, labels, 0.05)  # warm
        _ = float(loss)
        n = 30
        t0 = time.time()
        for _ in range(n):
            loss, w, mom = step(emb, w, mom, labels, 0.05)
        _ = float(loss)
        dt = (time.time() - t0) / n * 1e3
        print(f"{name} fused head step (C=1M bf16): {dt:.2f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
