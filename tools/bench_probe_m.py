"""probe_m sweep for the two-stage merge probe (round 5 follow-up).

_merge_tile_topk probes the top-``probe_m`` tile values before deciding
whether the full k-pass extraction is needed (docs/PERF.md round-5
ladder). probe_m trades always-paid probe passes (probe_m·2 per firing
tile) against deep-fallback frequency (more rows exceed a smaller
probe). The deep-fallback duty is unobservable without an instrumented
kernel, so sweep the end-to-end head fwd+bwd chain instead — same
methodology as tools/bench_capacity_floor.py (chained fori_loop, true
data dependency, value-fetch sync, two chain lengths), capacity shapes,
the SHIPPED auto tile (2048 int8).

Run on the axon chip, background, no timeout:
    python tools/bench_probe_m.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")

from bench_capacity_floor import chain_time  # noqa: E402

B = 128
D = 512
Q = 10 << 20
K = 10


def main():
    import vlsfr_tpu.ops.twin_margin as tm
    from vlsfr_tpu.core.ffc import init_queue
    from vlsfr_tpu.ops.twin_margin import quad_add_margin

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)  # noqa: E731

    ex = jnp.asarray(unit(rng.standard_normal((B, D)).astype(np.float32)))
    ey = jnp.asarray(unit(rng.standard_normal((B, D)).astype(np.float32)))
    ga = jnp.asarray(unit(rng.standard_normal((B, D)).astype(np.float32)))
    gb = jnp.asarray(unit(rng.standard_normal((B, D)).astype(np.float32)))

    def plan():
        rows = jnp.asarray(rng.integers(0, 2, B).astype(np.int32))
        cols = jnp.asarray(rng.integers(0, Q, B).astype(np.int32))
        seen = jnp.asarray((rng.random(B) < 0.7).astype(np.float32))
        labels = jnp.asarray(np.where(rng.random(B) < 0.25, -1,
                                      np.asarray(cols)).astype(np.int32))
        return rows, cols, seen, labels

    planA, planB = plan(), plan()
    labA, labB = planA[3], planB[3]
    q8, qs = init_queue(jax.random.PRNGKey(1), Q, D, jnp.int8)

    # the shipped operating point: auto tile (2048 at int8 b128)
    kw = dict(loss_type="Arc", margin=0.5, scale=32.0, hard_neg=K,
              use_pallas=True, int8_compute=True, tile=2048)

    orig = tm._merge_tile_topk
    base = None
    for pm in (2, 4, 8):
        tm._merge_tile_topk = functools.partial(orig, probe_m=pm)

        def head_loss(e1, e2, q8_, qs_):
            la, lb = quad_add_margin(e1, e2, q8_, ga, gb, planA[:3],
                                     planB[:3], labA, labB,
                                     qscales=qs_, **kw)
            return la + lb

        grad_head = jax.value_and_grad(head_loss, argnums=(0, 1))

        def body(i, c, q8_, qs_):
            e1, e2 = c
            l, (g1, g2) = grad_head(e1, e2, q8_, qs_)
            return (e1 + 1e-9 * g1 + 1e-12 * l, e2 + 1e-9 * g2)

        try:
            t = chain_time(body, (ex, ey), n=4,
                           label=f"head fwd+bwd probe_m={pm}",
                           consts=(q8, qs))
            if pm == 4:
                base = t
        except Exception as e:
            print(f"probe_m={pm}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)
        finally:
            tm._merge_tile_topk = orig
    if base is not None:
        print(f"(shipped probe_m=4 reference: {base:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
