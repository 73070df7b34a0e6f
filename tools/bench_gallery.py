"""1:N gallery search bench (eval/index.py streaming tiled search).

Measures the jitted FaceIndex search path at serving-realistic sizes on
the real chip: G ∈ {1M, 4M} L2-normalized gallery rows, Q=128 probes,
k=10, storage ∈ {f32, bf16, int8+per-row-scale}. The search is HBM-bound
(one pass over the gallery per query batch), so the expected ranking is
int8 > bf16 > f32 by bytes — the classifier-storage study (docs/PERF.md)
measured the same access pattern at 1.37-1.45× for int8 over bf16.

Timing: chained-in-jit with a data-dependent perturbation (the tunnel's
block_until_ready does not await non-donating graphs; a loop-invariant
body is CSE'd — see tools/bench_int8_classifier.py), two chain lengths to
cancel overhead, value-fetch sync.

Run on the real chip: python tools/bench_gallery.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vlsfr_tpu.eval.index import FaceIndex

jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")

Q, D, K, TILE = 128, 512, 10, 65536


@functools.partial(jax.jit, static_argnums=1)
def _make_gallery(key, g_shape):
    g = jax.random.normal(key, g_shape, jnp.float32)
    return g / jnp.linalg.norm(g, axis=-1, keepdims=True)


@jax.jit
def _quantize(g):
    scale = jnp.maximum(jnp.max(jnp.abs(g), -1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(g / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _make_int8_gallery(key, g_rows):
    """Generate an int8 gallery CHUNKED (1M rows at a time): a full [G, D]
    f32 intermediate at G=10M would be 20 GB — more than the chip."""
    chunk = 1 << 20
    qs, ss = [], []
    for i in range(0, g_rows, chunk):
        k = jax.random.fold_in(key, i)
        q, s = _quantize(_make_gallery(k, (min(chunk, g_rows - i), D)))
        qs.append(q)
        ss.append(s)
    return jnp.concatenate(qs), jnp.concatenate(ss)


def _index_with_device_gallery(n_rows, gallery, scales, int8, dtype):
    """FaceIndex wired to an on-device gallery (skips the numpy build —
    an 8 GB host-side concat+normalize on this 1-core host)."""
    idx = FaceIndex(feat_dim=D, int8=int8, tile=TILE, compute_dtype=dtype)
    idx._n_rows = n_rows
    idx._gallery_labels = np.arange(n_rows, dtype=np.int64)
    idx._gallery, idx._scales = gallery, scales
    idx._search = functools.partial(idx._make_search(TILE), gallery, scales)
    return idx


def bench_search(idx, queries, iters=(2, 8)):
    # the gallery/scales MUST be chain-jit ARGUMENTS: binding them via the
    # index's partial and tracing that inside the outer jit captures them
    # as multi-GB compile-time constants (CLAUDE.md gotcha — hangs compile)
    sfn = idx._make_search(idx.tile)
    g, s = idx._gallery, idx._scales
    s_args = (s,) if s is not None else (None,)

    def make(n):
        @jax.jit
        def chain(g, s, q):
            def body(i, carry):
                acc, prev = carry
                # perturb the SCALES too: with loop-invariant s, XLA hoists
                # the int8 dequant out of the loop and every iteration reads
                # a cached bf16 copy instead of the int8 gallery (measured:
                # int8 "speedup" collapsed to 0.98x; f32 read an apparent
                # 1445 GB/s — above roofline — via a hoisted bf16 convert)
                sp = s * (1.0 + prev[0, 0] * 1e-30) if s is not None else None
                v, _ = sfn(g, sp, q + (prev[:, :1] * 1e-30), K)
                return (acc + jnp.sum(v), v)
            acc, _ = jax.lax.fori_loop(
                0, n, body, (0.0, jnp.zeros((q.shape[0], K), jnp.float32)))
            return acc
        return chain

    t = {}
    for n in iters:
        ch = make(n)
        _ = float(ch(g, *s_args, queries))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(ch(g, *s_args, queries))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[iters[1]] - t[iters[0]]) / (iters[1] - iters[0])


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    queries = np.asarray(
        jax.device_get(_make_gallery(jax.random.PRNGKey(1), (Q, D))))
    for g_rows in (1 << 20, 4 << 20):
        gal = _make_gallery(key, (g_rows, D))
        rows = {}
        configs = [("f32", False, jnp.float32), ("bf16", False, jnp.bfloat16),
                   ("int8", True, jnp.bfloat16)]
        if g_rows >= (4 << 20):
            configs = configs[1:]  # 8 GB f32 gallery + f32 compute: skip
        for name, int8, dtype in configs:
            if int8:
                g, s = _quantize(gal)
                nbytes = g_rows * D + g_rows * 4
            else:
                g, s = gal.astype(dtype), None
                nbytes = g_rows * D * np.dtype(dtype).itemsize
            g = jax.block_until_ready(g)
            idx = _index_with_device_gallery(g_rows, g, s, int8, dtype)
            # correctness probe: top-1 of a gallery row is itself
            v, r, _ = idx.search(np.asarray(jax.device_get(gal[:8])), k=2)
            assert (r[:, 0] == np.arange(8)).all(), r[:, 0]
            sec = bench_search(idx, jnp.asarray(queries))
            rows[name] = sec
            print(f"G={g_rows>>20}M {name}: {sec*1e3:7.2f} ms/search-batch "
                  f"({nbytes/sec/1e9:5.0f} GB/s, {Q/sec:8.0f} probes/s)",
                  flush=True)
        base = rows.get("bf16")
        if base and "int8" in rows:
            print(f"G={g_rows>>20}M int8 speedup vs bf16: "
                  f"{base/rows['int8']:.2f}x", flush=True)
        del gal

    # the "very large scale" headline: 10M-identity 1:N search on ONE chip
    # (10M × 512 int8 ≈ 5.4 GB with scales — impossible in f32/bf16+probe
    # margins; generated chunked to avoid a 20 GB f32 intermediate)
    g_rows = 10 << 20
    g, s = _make_int8_gallery(key, g_rows)
    g = jax.block_until_ready(g)
    idx = _index_with_device_gallery(g_rows, g, s, True, jnp.bfloat16)
    probe = np.asarray(jax.device_get(
        g[:8].astype(jnp.float32) * s[:8, None]))
    v, r, _ = idx.search(probe, k=2)
    assert (r[:, 0] == np.arange(8)).all(), r[:, 0]
    nbytes = g_rows * D + g_rows * 4
    for q_batch in (Q, 1024):
        qb = np.asarray(jax.device_get(
            _make_gallery(jax.random.PRNGKey(1), (q_batch, D))))
        sec = bench_search(idx, jnp.asarray(qb))
        print(f"G={g_rows>>20}M int8 Q={q_batch}: {sec*1e3:7.2f} ms/search-"
              f"batch ({nbytes/sec/1e9:5.0f} GB/s, {q_batch/sec:8.0f} "
              f"probes/s)", flush=True)


if __name__ == "__main__":
    main()
