"""Tunnel-safe device timing + gallery-building helpers for benches.

Two platform gotchas every bench on this stack must survive (CLAUDE.md;
learned the hard way in rounds 2-3):

1. **The tunnel's `block_until_ready` does not await device completion
   for non-donating graphs** — a 4096³ matmul "timed" at 1.7 PFLOP/s.
   Timing must chain the op N times inside ONE jit (`lax.fori_loop`)
   with a data dependency between iterations, sync via a VALUE fetch,
   and difference two chain lengths to cancel launch overhead.
2. **XLA hoists loop-invariant work out of the chain** — with constant
   int8 scales the dequant was hoisted and every "int8" iteration read a
   cached bf16 copy (apparent 0.98x speedup); a constant f32 gallery's
   matmul-operand convert was hoisted to an apparent 1445 GB/s. Every
   operand whose processing you mean to measure must be perturbed per
   iteration (the helpers thread a ~1e-30 epsilon from the previous
   iteration's result).

Shared by bench.py (search mode) and tools/bench_gallery.py — keep the
trick in ONE place so a fix reaches every consumer.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=1)
def make_unit_rows(key, shape):
    """[N, D] f32 L2-normalized rows (jitted: no eager 8 GB intermediates)."""
    g = jax.random.normal(key, shape, jnp.float32)
    return g / jnp.linalg.norm(g, axis=-1, keepdims=True)


@jax.jit
def quantize_rows(g):
    """[G, D] float rows -> (symmetric per-row int8, f32 scale)."""
    scale = jnp.maximum(jnp.max(jnp.abs(g), -1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(g / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def make_int8_gallery(key, g_rows, d, chunk=1 << 20):
    """Chunked unit-row int8 gallery: a full [G, D] f32 intermediate at
    G=10M would be 20 GB — more than the chip. ``g_rows`` must be a
    multiple of ``chunk``."""
    assert g_rows % chunk == 0, (g_rows, chunk)
    qs, ss = [], []
    for i in range(0, g_rows, chunk):
        q, s = quantize_rows(make_unit_rows(jax.random.fold_in(key, i),
                                            (chunk, d)))
        qs.append(q)
        ss.append(s)
    return jnp.concatenate(qs), jnp.concatenate(ss)


def timed_search_chain(search_fn, g, s, queries, k, iters=(2, 8), reps=3):
    """Per-call seconds of ``search_fn(g, s, queries, k) -> (vals, idx)``,
    measured by the chained-in-jit recipe above. ``s`` may be None
    (non-int8 galleries); when present it is perturbed per iteration so
    the dequant cannot be hoisted."""
    q_n, k_shape = queries.shape[0], k

    def make(n):
        @jax.jit
        def chain(g, s, q):
            def body(i, carry):
                acc, prev = carry
                sp = s * (1.0 + prev[0, 0] * 1e-30) if s is not None else None
                v, _ = search_fn(g, sp, q + prev[:, :1] * 1e-30, k_shape)
                return (acc + jnp.sum(v), v)
            acc, _ = jax.lax.fori_loop(
                0, n, body, (0.0, jnp.zeros((q_n, k_shape), jnp.float32)))
            return acc
        return chain

    t = {}
    for n in iters:
        ch = make(n)
        float(ch(g, s, queries))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(ch(g, s, queries))  # value fetch = the only real sync
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[iters[1]] - t[iters[0]]) / (iters[1] - iters[0])
