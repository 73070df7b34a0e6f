"""Real-chip validation + bench of the Pallas-backed sharded twin head.

Builds a (data=1, model=1) mesh on the single tunneled v5e chip, runs the
shard_map(Pallas) twin composition (parallel/sharded_twin.py) at
production shapes, checks its loss/d_emb against the single-shard twin
kernels (ops/twin_margin.py), and times both head paths.

Run (background, no timeout — cold compiles through the tunnel take
minutes):  python tools/bench_sharded_twin.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  "/root/.vlsfr_jax_cache")


def main():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vlsfr_tpu.ops.twin_margin import twin_add_margin
    from vlsfr_tpu.parallel.sharded_twin import make_sharded_twin_loss

    dev = jax.devices()[0]
    print("device:", dev)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))

    b, d = 128, 512
    rng = np.random.default_rng(0)

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    for q, qdtype in ((1 << 20, jnp.float32), (1 << 20, jnp.bfloat16)):
        emb = jnp.asarray(unit(rng.standard_normal((b, d)).astype(np.float32)))
        g = jnp.asarray(unit(rng.standard_normal((b, d)).astype(np.float32)))
        rows = jnp.asarray(rng.integers(0, 2, b).astype(np.int32))
        cols = jnp.asarray(rng.integers(0, q, b).astype(np.int32))
        seen = jnp.asarray((rng.random(b) < 0.7).astype(np.float32))
        labels = np.asarray(cols)  # targets at written slots: blend matters
        labels = jnp.asarray(np.where(rng.random(b) < 0.25, -1, labels).astype(np.int32))
        key = jax.random.PRNGKey(1)
        queue = jax.jit(
            lambda k: jax.random.normal(k, (2, q, d), jnp.float32).astype(qdtype)
        )(key)
        queue = jax.device_put(queue, NamedSharding(mesh, P(None, "model", None)))

        kw = dict(loss_type="Arc", margin=0.5, scale=32.0, hard_neg=10)
        sharded = make_sharded_twin_loss(mesh, use_pallas=True, **kw)
        # queue passed as an ARGUMENT — a multi-GB jit closure constant
        # hangs compiles through the tunnel (CLAUDE.md environment gotchas)
        f_sh = jax.jit(jax.value_and_grad(
            lambda e, qu: sharded(e, qu, g, rows, cols, seen, labels),
            argnums=0))
        f_single = jax.jit(jax.value_and_grad(
            lambda e, qu: twin_add_margin(e, qu, g, rows, cols, seen, labels,
                                          **kw), argnums=0))

        t0 = time.time()
        l_sh, g_sh = f_sh(emb, queue)
        l_sh = float(l_sh)
        print(f"q={q} {np.dtype(qdtype).name}: sharded compile+run "
              f"{time.time()-t0:.1f}s loss={l_sh:.6f}")
        t0 = time.time()
        l_si, g_si = f_single(emb, queue)
        l_si = float(l_si)
        print(f"  single compile+run {time.time()-t0:.1f}s loss={l_si:.6f}")
        gd = float(jnp.max(jnp.abs(g_sh - g_si)))
        print(f"  |loss diff|={abs(l_sh-l_si):.2e} max|d_emb diff|={gd:.2e}")

        for name, f in (("sharded", f_sh), ("single", f_single)):
            _ = float(f(emb, queue)[0])  # value-fetch sync (tunnel
            # block_until_ready is unreliable for non-donating graphs)
            n = 30
            t0 = time.time()
            for _ in range(n):
                out = f(emb, queue)
            _ = float(out[0])
            dt = (time.time() - t0) / n * 1e3
            print(f"  {name} head fwd+bwd: {dt:.2f} ms/iter")


if __name__ == "__main__":
    main()
