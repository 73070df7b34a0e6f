"""Micro-bisect of the one-pass quad FORWARD kernel on the real chip.

The full-step bench showed the one-pass forward at ~36 us/tile where the
two-pass forward runs ~8 (q=10x2^20 int8c, b=128) — this tool times the
fwd pallas call alone under variants that monkeypatch pieces out, to
find which addition serializes the stream:

    two_pass   one_pass=False (baseline fwd)
    one_pass   full
    no_sdot    S accumulation's MXU dot (and its [T, D] int8->bf16
               operand convert) replaced by zeros — the S-ref RMW chain
               and the per-tile zx record stay

If no_sdot ~= two_pass the cost is the dot/convert; if no_sdot stays
slow it is the serialized accumulator RMW / the grid-indexed zx store.

Timing: the kernel is ~30-300 ms at this queue size, so per-call value
fetch sync noise (~1 ms) is negligible; inputs stay device-resident.

Usage: python tools/bench_one_pass_kernel.py [queue_log2_millions]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))

import vlsfr_tpu.ops.twin_margin as tm  # noqa: E402
from vlsfr_tpu.ops.qqueue import quantize_rows  # noqa: E402

B, D, K = 128, 512, 10
Q = (int(sys.argv[1]) if len(sys.argv) > 1 else 10) << 20


def unit(key, shape):
    x = jax.random.normal(key, shape, jnp.float32)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@jax.jit
def make_queue(key):
    q = unit(key, (2, Q, D))
    return quantize_rows(q)


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    q_int, q_s = make_queue(keys[0])
    emb_x = unit(keys[1], (B, D))
    emb_y = unit(keys[2], (B, D))
    g_a = unit(keys[3], (B, D))
    g_b = unit(keys[4], (B, D))
    rng = np.random.default_rng(0)
    cols_a = jnp.asarray(rng.integers(0, Q, B), jnp.int32)
    cols_b = jnp.asarray(rng.integers(0, Q, B), jnp.int32)
    rows = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
    seen = jnp.asarray(rng.integers(0, 2, B), jnp.float32)
    lab_a = jnp.where(jnp.asarray(rng.random(B) < 0.25), -1, cols_a)
    lab_b = jnp.where(jnp.asarray(rng.random(B) < 0.25), -1, cols_b)

    kw = dict(loss_type="Arc", margin=0.5, scale=32.0, k=K, mask_svfc=1.2,
              tile=1024, qscales=q_s, int8_compute=True)

    def run(tag, one_pass, patch=None):
        saved = {}
        if patch:
            for name, fn in patch.items():
                saved[name] = getattr(tm, name)
                setattr(tm, name, fn)
        try:
            @jax.jit
            def fwd(ex, ey, qi, qs):
                # queue passed as an ARG — a closure capture serializes
                # the 10.8 GB array into the module as a constant
                gts_a = tm.compute_twin_gt(ex, qi, g_a, rows, cols_a,
                                           seen, lab_a, qscales=qs)
                gts_b = tm.compute_twin_gt(ey, qi, g_b, rows, cols_b,
                                           seen, lab_b, qscales=qs)
                out, res = tm.pallas_quad_fwd(
                    ex, ey, qi, g_a, g_b, (rows, cols_a, seen),
                    (rows, cols_b, seen), lab_a, lab_b, gts_a, gts_b,
                    one_pass=one_pass, qscales=qs, **kw2)
                return sum(jnp.sum(o) for o in out) + jnp.sum(res[4])

            kw2 = dict(kw)
            kw2.pop("qscales")
            v = float(fwd(emb_x, emb_y, q_int, q_s))  # compile + warm
            float(fwd(emb_x, emb_y, q_int, q_s))
            n = 6
            t0 = time.perf_counter()
            for _ in range(n):
                v = float(fwd(emb_x, emb_y, q_int, q_s))
            dt = (time.perf_counter() - t0) / n
            print(f"{tag:>10}: {dt * 1e3:8.2f} ms  (check {v:.4f})",
                  flush=True)
        finally:
            for name, fn in saved.items():
                setattr(tm, name, fn)

    zeros_demb = lambda dc, w, s, m: jnp.zeros(  # noqa: E731
        (dc.shape[0], D), jnp.float32)

    run("two_pass", False)
    run("one_pass", True)
    run("no_sdot", True, {"_demb_clean": zeros_demb})


if __name__ == "__main__":
    main()
