"""Int8 classifier STORAGE study for the streaming softmax head.

The 1M-identity streaming softmax row is HBM-bound (0.82 of the HBM
roofline, docs/PERF.md round 3): the step's dominant traffic is reading
the [C, D] classifier (and its transposed read in the backward). The
gallery-conv int8 study measured a NEGATIVE training result because conv
int8 wins MXU time while ADDING activation bytes — but here the proposal
is the opposite shape: int8 halves the BYTES of the dominant read, and
the MXU was never the bottleneck.

This bench isolates the forward-read question before any kernel work:
stream a [C, D] classifier through tiled cosine logits + online-softmax
reduction (the exact access pattern of ops/margin_pallas.py's forward),
with the classifier stored

  a) bf16 [C, D]                      (today's classifier_dtype=bfloat16)
  b) int8 [C, D] + f32 per-row scale  (dequant fused into the tile read)

If XLA fuses the int8→bf16 convert + row-scale multiply into the dot's
operand load (TPU has native int8 paths), (b) should approach 2× on this
HBM-bound pass. Run: python tools/bench_int8_classifier.py
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

B, D, TILE = 128, 512, 8192


def stream_bf16(emb, w):
    n_tiles = w.shape[0] // TILE
    wt = w.reshape(n_tiles, TILE, D)

    def body(carry, tile):
        m, s = carry
        z = jnp.dot(emb, tile.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(z, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(z - m_new[:, None]), -1)
        return (m_new, s), None

    init = (jnp.full((B,), -1e30, jnp.float32), jnp.zeros((B,), jnp.float32))
    (m, s), _ = jax.lax.scan(body, init, wt)
    return m + jnp.log(s)


def stream_int8(emb, wq, scale):
    n_tiles = wq.shape[0] // TILE
    wt = wq.reshape(n_tiles, TILE, D)
    st = scale.reshape(n_tiles, TILE)

    def body(carry, tile_sc):
        m, s = carry
        tile, sc = tile_sc
        # dequant fused into the operand read: int8 -> bf16 * row scale
        w = tile.astype(jnp.bfloat16) * sc[:, None].astype(jnp.bfloat16)
        z = jnp.dot(emb, w.T, preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(z, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(z - m_new[:, None]), -1)
        return (m_new, s), None

    init = (jnp.full((B,), -1e30, jnp.float32), jnp.zeros((B,), jnp.float32))
    (m, s), _ = jax.lax.scan(body, init, (wt, st))
    return m + jnp.log(s)


def bench(fn, *args, iters=(4, 16)):
    """Chained-in-jit overhead-cancelled seconds per application.

    The chain must be DATA-DEPENDENT iteration to iteration — a
    loop-invariant body is CSE'd out of the fori_loop by XLA (measured:
    negative per-iter time after the two-length subtraction). Here each
    iteration perturbs the embedding by the previous logsumexp (scaled to
    numerical no-op) so the dots cannot be hoisted."""
    def make(n):
        @jax.jit
        def chain(emb, *rest):
            def body(i, carry):
                acc, prev = carry
                out = fn(emb + (prev[:, None] * 1e-30).astype(emb.dtype), *rest)
                return (acc + jnp.sum(out), out)
            acc, _ = jax.lax.fori_loop(
                0, n, body, (0.0, jnp.zeros((emb.shape[0],), jnp.float32)))
            return acc
        return chain

    t = {}
    for n in iters:
        ch = make(n)
        _ = float(ch(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(ch(*args))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[iters[1]] - t[iters[0]]) / (iters[1] - iters[0])


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    for c in (1 << 20, 2 << 20):
        w32 = rng.standard_normal((c, D)).astype(np.float32)
        w32 /= np.linalg.norm(w32, axis=-1, keepdims=True)
        w_bf = jnp.asarray(w32, jnp.bfloat16)
        scale = jnp.asarray(np.abs(w32).max(-1) / 127.0, jnp.float32)
        wq = jnp.asarray(
            np.clip(np.round(w32 / (np.abs(w32).max(-1, keepdims=True) / 127.0)),
                    -127, 127), jnp.int8)
        # correctness: logsumexp agreement
        l_b = np.asarray(stream_bf16(emb, w_bf))
        l_q = np.asarray(stream_int8(emb, wq, scale))
        err = np.max(np.abs(l_b - l_q))
        t_b = bench(stream_bf16, emb, w_bf)
        t_q = bench(stream_int8, emb, wq, scale)
        bytes_b = c * D * 2
        bytes_q = c * D * 1 + c * 4
        print(f"C={c>>20}M: bf16 {t_b*1e3:.2f} ms ({bytes_b/t_b/1e9:.0f} GB/s) | "
              f"int8 {t_q*1e3:.2f} ms ({bytes_q/t_q/1e9:.0f} GB/s) | "
              f"speedup {t_b/t_q:.2f}x | max|dlogz| {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
