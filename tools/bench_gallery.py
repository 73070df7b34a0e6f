"""1:N gallery search bench (eval/index.py streaming tiled search).

Measures the jitted FaceIndex search path at serving-realistic sizes on
the real chip: G ∈ {1M, 4M} L2-normalized gallery rows, Q=128 probes,
k=10, storage ∈ {f32, bf16, int8+per-row-scale}, plus the 10M-row int8
headline (Q ∈ {128, 1024}) and a mesh=(1,1) shard_map equivalence check.

Timing/building: vlsfr_tpu/utils/benchtime.py — the chained-in-jit
recipe with per-iteration scale perturbation (the tunnel's
block_until_ready does not await non-donating graphs, and XLA hoists a
loop-invariant dequant/convert out of the chain: measured apparent
1445 GB/s f32 and 0.98x "int8" before the perturbation).

Run on the real chip: python tools/bench_gallery.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vlsfr_tpu.eval.index import FaceIndex
from vlsfr_tpu.utils.benchtime import (
    make_int8_gallery,
    make_unit_rows,
    quantize_rows,
    timed_search_chain,
)

jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")

Q, D, K, TILE = 128, 512, 10, 65536


def _index_with_device_gallery(n_rows, gallery, scales, int8, dtype):
    """FaceIndex wired to an on-device gallery (skips the numpy build —
    an 8 GB host-side concat+normalize on this 1-core host)."""
    idx = FaceIndex(feat_dim=D, int8=int8, tile=TILE, compute_dtype=dtype)
    idx._n_rows = n_rows
    idx._gallery_labels = np.arange(n_rows, dtype=np.int64)
    idx._gallery, idx._scales = gallery, scales
    idx._search = functools.partial(idx._make_search(TILE), gallery, scales)
    return idx


def bench_search(idx, queries):
    # the gallery/scales MUST be chain-jit ARGUMENTS: binding them via the
    # index's partial and tracing that inside the outer jit captures them
    # as multi-GB compile-time constants (CLAUDE.md gotcha — hangs compile)
    return timed_search_chain(idx._make_search(idx.tile), idx._gallery,
                              idx._scales, queries, K)


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    queries = np.asarray(
        jax.device_get(make_unit_rows(jax.random.PRNGKey(1), (Q, D))))
    for g_rows in (1 << 20, 4 << 20):
        gal = make_unit_rows(key, (g_rows, D))
        rows = {}
        configs = [("f32", False, jnp.float32), ("bf16", False, jnp.bfloat16),
                   ("int8", True, jnp.bfloat16)]
        if g_rows >= (4 << 20):
            configs = configs[1:]  # 8 GB f32 gallery + f32 compute: skip
        for name, int8, dtype in configs:
            if int8:
                g, s = quantize_rows(gal)
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
    g, s = make_int8_gallery(key, g_rows, D)
    g = jax.block_until_ready(g)
    idx = _index_with_device_gallery(g_rows, g, s, True, jnp.bfloat16)
    probe = np.asarray(jax.device_get(
        g[:8].astype(jnp.float32) * s[:8, None]))
    v, r, _ = idx.search(probe, k=2)
    assert (r[:, 0] == np.arange(8)).all(), r[:, 0]
    nbytes = g_rows * D + g_rows * 4
    # int8-COMPUTE twin (compute_dtype=int8: queries quantized too, the
    # scoring matmul runs int8×int8→int32 at 2× the bf16 MXU rate — the
    # lever for the matmul-bound Q=1024 row)
    idx_c = _index_with_device_gallery(g_rows, g, s, True, jnp.int8)
    v_c, r_c, _ = idx_c.search(probe, k=2)
    assert (r_c[:, 0] == np.arange(8)).all(), r_c[:, 0]
    for q_batch in (Q, 1024):
        qb = np.asarray(jax.device_get(
            make_unit_rows(jax.random.PRNGKey(1), (q_batch, D))))
        for name, ix in (("bf16-compute", idx), ("int8-compute", idx_c)):
            sec = bench_search(ix, jnp.asarray(qb))
            print(f"G={g_rows>>20}M int8 Q={q_batch} {name}: {sec*1e3:7.2f} "
                  f"ms/search-batch ({nbytes/sec/1e9:5.0f} GB/s, "
                  f"{q_batch/sec:8.0f} probes/s)", flush=True)

    # the MESH (shard_map) search path compiled + checked on the real chip
    # at mesh=(1,1): must return the same hits as the single-device path
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    sh = FaceIndex(feat_dim=D, mesh=mesh, int8=True, tile=TILE)
    sh._n_rows, sh._gallery_labels = g_rows, idx._gallery_labels
    sh._gallery, sh._scales = g, s
    sh._search = functools.partial(sh._make_search(TILE), g, s)
    v_s, r_s, _ = sh.search(probe, k=5)
    v_u, r_u, _ = idx.search(probe, k=5)
    assert (r_s == r_u).all(), (r_s, r_u)
    np.testing.assert_allclose(v_s, v_u, atol=1e-5)
    print("sharded mesh=(1,1) search on-chip: hits match single-device ok",
          flush=True)


if __name__ == "__main__":
    main()
