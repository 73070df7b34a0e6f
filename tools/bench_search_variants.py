"""Top-k strategy study for the streaming 1:N gallery search.

bench_gallery.py measured the tiled search at 94-167 GB/s — 12-20% of
HBM roofline — with int8 returning only 1.12-1.16x over bf16: the
per-tile ``lax.top_k`` over [Q, tile] (a sort-based lowering) dominates,
not the gallery read. Candidate fixes measured here on the real chip,
G=1M bf16, Q=128, D=512, k=10:

  a. exact/concat   — current: top_k([carry k | tile scores])
  b. exact/2phase   — top_k(tile scores) then merge 2k candidates
  c. approx         — jax.lax.approx_max_k (PartialReduce, the TPU op
                      built for exactly this MIPS shape) + 2k merge
  d. approx_exact   — approx_max_k with recall_target=1.0 (exact result
                      via the same PartialReduce lowering)
  each at tile sizes 8192 / 32768 / 65536 (33.5 MB f32 scores at 65536
  spill VMEM; 4 MB at 8192 stay resident).

Chained-in-jit timing with value-fetch sync (tunnel gotcha), gallery as
chain ARGUMENTS (closure capture = multi-GB constant, hangs compile).

Run on the real chip: python tools/bench_search_variants.py
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

Q, D, K = 128, 512, 10
G_ROWS = 1 << 20


def make_search(variant, tile, recall=0.95):
    def stream(g, q):
        n_t = g.shape[0] // tile
        gt3 = g.reshape(n_t, tile, D)

        def body(carry, xs_i):
            vals, idx = carry
            i, t = xs_i
            z = jnp.dot(q, t.T.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            gid = i * tile + jnp.arange(tile, dtype=jnp.int32)
            if variant == "exact_concat":
                cand_v = jnp.concatenate([vals, z], axis=1)
                cand_i = jnp.concatenate(
                    [idx, jnp.broadcast_to(gid, z.shape)], axis=1)
                v, pos = jax.lax.top_k(cand_v, K)
                return (v, jnp.take_along_axis(cand_i, pos, axis=1)), None
            if variant == "exact_2phase":
                tv, tp = jax.lax.top_k(z, K)
            elif variant == "approx":
                tv, tp = jax.lax.approx_max_k(z, K, recall_target=recall)
            else:  # approx_exact
                tv, tp = jax.lax.approx_max_k(z, K, recall_target=1.0)
            ti = gid[tp]
            cand_v = jnp.concatenate([vals, tv], axis=1)
            cand_i = jnp.concatenate([idx, ti], axis=1)
            v, pos = jax.lax.top_k(cand_v, K)
            return (v, jnp.take_along_axis(cand_i, pos, axis=1)), None

        init = (jnp.full((Q, K), -1e30, jnp.float32),
                jnp.full((Q, K), -1, jnp.int32))
        (vals, idx), _ = jax.lax.scan(
            body, init, (jnp.arange(n_t), gt3))
        return vals, idx

    return stream


def bench(fn, g, q):
    from vlsfr_tpu.utils.benchtime import timed_search_chain

    return timed_search_chain(lambda g, s, q, k: fn(g, q), g, None, q, K)


@functools.partial(jax.jit, static_argnums=1)
def _make_gallery(key, shape):
    g = jax.random.normal(key, shape, jnp.float32)
    return (g / jnp.linalg.norm(g, axis=-1, keepdims=True)).astype(jnp.bfloat16)


def main():
    print("device:", jax.devices()[0], flush=True)
    g = jax.block_until_ready(_make_gallery(jax.random.PRNGKey(0), (G_ROWS, D)))
    q = _make_gallery(jax.random.PRNGKey(1), (Q, D))
    nbytes = G_ROWS * D * 2

    # reference exact answer for recall check
    ref_fn = jax.jit(make_search("exact_concat", 65536))
    ref_v, ref_i = jax.device_get(ref_fn(g, q))

    for variant in ("exact_concat", "exact_2phase", "approx", "approx_exact"):
        for tile in (8192, 32768, 65536):
            fn = make_search(variant, tile)
            v, i = jax.device_get(jax.jit(fn)(g, q))
            recall = float(np.mean([
                len(set(i[r]) & set(ref_i[r])) / K for r in range(Q)]))
            sec = bench(fn, g, q)
            print(f"{variant:13s} tile={tile:6d}: {sec*1e3:7.2f} ms "
                  f"({nbytes/sec/1e9:5.0f} GB/s) recall@{K}={recall:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
