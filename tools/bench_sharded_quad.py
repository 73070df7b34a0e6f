"""Real-chip validation + bench of the Pallas-backed sharded QUAD head.

Same harness as tools/bench_sharded_twin.py but for the both-directions
composition (parallel/sharded_quad.py) vs the single-shard quad op at
mesh=(1,1), q=1M, ir50 shapes. Run in background, no timeout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")


def main():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vlsfr_tpu.ops.twin_margin import quad_add_margin
    from vlsfr_tpu.parallel.sharded_quad import make_sharded_quad_loss

    print("device:", jax.devices()[0], flush=True)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    b, d = 128, 512
    rng = np.random.default_rng(0)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)  # noqa: E731

    def plan():
        rows = jnp.asarray(rng.integers(0, 2, b).astype(np.int32))
        cols = jnp.asarray(rng.integers(0, 1 << 20, b).astype(np.int32))
        seen = jnp.asarray((rng.random(b) < 0.7).astype(np.float32))
        labels = jnp.asarray(np.where(rng.random(b) < 0.25, -1,
                                      np.asarray(cols)).astype(np.int32))
        return rows, cols, seen, labels

    for q, qdtype in ((1 << 20, jnp.float32), (1 << 20, jnp.bfloat16)):
        ex = jnp.asarray(unit(rng.standard_normal((b, d)).astype(np.float32)))
        ey = jnp.asarray(unit(rng.standard_normal((b, d)).astype(np.float32)))
        ga = jnp.asarray(unit(rng.standard_normal((b, d)).astype(np.float32)))
        gb = jnp.asarray(unit(rng.standard_normal((b, d)).astype(np.float32)))
        rowsA, colsA, seenA, labA = plan()
        rowsB, colsB, seenB, labB = plan()
        queue = jax.jit(lambda k: jax.random.normal(
            k, (2, q, d), jnp.float32).astype(qdtype))(jax.random.PRNGKey(1))
        queue = jax.device_put(queue, NamedSharding(mesh, P(None, "model", None)))

        kw = dict(loss_type="Arc", margin=0.5, scale=32.0, hard_neg=10)
        sharded = make_sharded_quad_loss(mesh, use_pallas=True, **kw)

        def sh_total(e1, e2, qu):
            la, lb = sharded(e1, e2, qu, ga, gb, (rowsA, colsA, seenA),
                             (rowsB, colsB, seenB), labA, labB)
            return la + lb

        def si_total(e1, e2, qu):
            la, lb = quad_add_margin(e1, e2, qu, ga, gb,
                                     (rowsA, colsA, seenA),
                                     (rowsB, colsB, seenB), labA, labB, **kw)
            return la + lb

        f_sh = jax.jit(jax.value_and_grad(sh_total, argnums=(0, 1)))
        f_si = jax.jit(jax.value_and_grad(si_total, argnums=(0, 1)))
        t0 = time.time()
        l_sh, (gx_sh, gy_sh) = jax.block_until_ready(f_sh(ex, ey, queue))
        print(f"q={q} {np.dtype(qdtype).name}: sharded quad compile+run "
              f"{time.time()-t0:.1f}s loss={float(l_sh):.6f}", flush=True)
        t0 = time.time()
        l_si, (gx_si, gy_si) = jax.block_until_ready(f_si(ex, ey, queue))
        print(f"  single quad compile+run {time.time()-t0:.1f}s "
              f"loss={float(l_si):.6f}", flush=True)
        print(f"  |loss diff|={abs(float(l_sh-l_si)):.2e} "
              f"max|dx|={float(jnp.max(jnp.abs(gx_sh-gx_si))):.2e} "
              f"max|dy|={float(jnp.max(jnp.abs(gy_sh-gy_si))):.2e}", flush=True)

        for name, f in (("sharded", f_sh), ("single", f_si)):
            _ = float(f(ex, ey, queue)[0])  # value-fetch sync
            n = 30
            t0 = time.time()
            for _ in range(n):
                out = f(ex, ey, queue)
            _ = float(out[0])  # value-fetch sync
            dt = (time.time() - t0) / n * 1e3
            print(f"  {name} quad fwd+bwd: {dt:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
