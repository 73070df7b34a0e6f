"""Per-pass floor decomposition of the capacity row (round-4 verdict item 3).

The BASELINE-config-5 step (q=10x2^20 int8-stored+int8-compute DCP pool,
ir50 b128, one v5e) runs at 164.26 ms (1558 img/s, docs/logs/
r4_tpu_queue.log). This tool measures each pass of that step IN ISOLATION
on the real chip so the residual (schedule/VPU overhead Mosaic and XLA
cannot overlap) is pinned per-pass rather than guessed:

  1. head fwd            — pallas quad forward, one queue stream
  2. head fwd+bwd        — + the backward queue stream
  3. probe train         — ir50 fwd+bwd+SGD on 2B=256 images (both
                           directions' probe passes)
  4. gallery EMA + fwd   — ir50 EMA param update + fwd on 2B images

Timing per the round-3 gotcha (the tunnel's block_until_ready does not
await non-donating graphs): every component is chained inside ONE jit via
lax.fori_loop with a true data dependency between iterations (grads/loss
feed the next carry — prevents the loop-invariant convert hoisting that
faked the round-3 int8 chain numbers), synced by a scalar value fetch,
at two chain lengths so the fixed overhead cancels.

Run on the axon chip, background, no timeout:
    python tools/bench_capacity_floor.py
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

B = 128
D = 512
Q = 10 << 20
K = 10


def chain_time(make_body, carry, n=8, label="", consts=()):
    """(t(2n) - t(n)) / n via two fori_loop chains inside jit.

    ``consts``: big device arrays the body needs (queue, images, EMA
    source). They MUST be jit ARGUMENTS, not closure captures — a closed-
    over 10.7 GB queue is lowered as an ir_constant, which materializes it
    to host numpy (RESOURCE_EXHAUSTED through the tunnel; the CLAUDE.md
    closure-constant gotcha). ``make_body(i, c, *consts)``."""

    def run(steps):
        f = jax.jit(lambda c, *k: jax.lax.fori_loop(
            0, steps, lambda i, cc: make_body(i, cc, *k), c))
        c = f(carry, *consts)  # compile + warm
        sync = float(jax.tree.leaves(c)[0].reshape(-1)[0])
        t0 = time.time()
        c = f(carry, *consts)
        sync = float(jax.tree.leaves(c)[0].reshape(-1)[0])  # noqa: F841
        return time.time() - t0

    t1 = run(n)
    t2 = run(2 * n)
    dt = (t2 - t1) / n * 1e3
    print(f"{label}: {dt:.2f} ms/iter  (chain {n}: {t1*1e3:.0f} ms, "
          f"{2*n}: {t2*1e3:.0f} ms)", flush=True)
    return dt


def main():
    from vlsfr_tpu.core.ffc import init_queue
    from vlsfr_tpu.models import create_net
    from vlsfr_tpu.ops.twin_margin import quad_add_margin

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)  # noqa: E731

    # ---- head operands (capacity shapes) ----
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

    rowsA, colsA, seenA, labA = plan()
    rowsB, colsB, seenB, labB = plan()

    # the PROVEN 10.5M-slot init (core/ffc.py): generate->norm->quantize
    # fused under one jit with NO reshape between stages — a reshape there
    # breaks the fusion and materializes the 21.5 GB f32 intermediate
    # (RESOURCE_EXHAUSTED on a 16 GB chip; cost this tool two runs)
    q8, qs = init_queue(jax.random.PRNGKey(1), Q, D, jnp.int8)

    kw = dict(loss_type="Arc", margin=0.5, scale=32.0, hard_neg=K,
              use_pallas=True, int8_compute=True, tile=1280)

    def head_loss(e1, e2, q8_, qs_):
        la, lb = quad_add_margin(e1, e2, q8_, ga, gb, (rowsA, colsA, seenA),
                                 (rowsB, colsB, seenB), labA, labB,
                                 qscales=qs_, **kw)
        return la + lb

    grad_head = jax.value_and_grad(head_loss, argnums=(0, 1))

    def head_fwd_body(i, c, q8_, qs_):
        e1, e2 = c
        l = head_loss(e1, e2, q8_, qs_)
        # true dependency: the next probe embeddings move with the loss
        return (e1 + 1e-12 * l, e2 - 1e-12 * l)

    def head_fb_body(i, c, q8_, qs_):
        e1, e2 = c
        l, (g1, g2) = grad_head(e1, e2, q8_, qs_)
        return (e1 + 1e-9 * g1 + 1e-12 * l, e2 + 1e-9 * g2)

    t_hf = chain_time(head_fwd_body, (ex, ey), n=4, label="head fwd",
                      consts=(q8, qs))
    t_hfb = chain_time(head_fb_body, (ex, ey), n=4, label="head fwd+bwd",
                       consts=(q8, qs))

    # ---- speed-of-light references for the head ----
    qbytes = Q * D  # one plane streamed per pass (int8)
    t_dma = qbytes / 819e9 * 1e3
    macs_dir = B * Q * D
    t_i8 = 2 * macs_dir * 2 / 394e12 * 1e3   # 2 dirs, int8 MACs->ops
    t_bf16 = 2 * macs_dir * 2 / 197e12 * 1e3
    print(f"SOL/pass: queue DMA {t_dma:.2f} ms, 2-dir int8 dots {t_i8:.2f} ms,"
          f" 2-dir bf16 dots {t_bf16:.2f} ms", flush=True)
    print(f"  fwd floor max(DMA, int8 dots) = {max(t_dma, t_i8):.2f} ms; "
          f"measured {t_hf:.2f} -> overhead {t_hf-max(t_dma, t_i8):.2f} ms",
          flush=True)
    bwd_floor = max(t_dma, t_i8 + t_bf16)  # z recompute int8 + demb bf16
    print(f"  bwd floor {bwd_floor:.2f} ms; measured increment "
          f"{t_hfb-t_hf:.2f} ms -> overhead {t_hfb-t_hf-bwd_floor:.2f} ms",
          flush=True)

    # ---- backbone passes (ir50, 2B images per step per role) ----
    model = create_net("ir50", feat_dim=D, dtype=jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((2 * B, 112, 112, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x2[:2], train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def probe_body(i, c, x2_):
        p, st = c

        def loss_fn(p_):
            emb, upd = model.apply({"params": p_, "batch_stats": st}, x2_,
                                   train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.abs(emb)) * 1e-3, upd["batch_stats"]

        (l, st2), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        p2 = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
        return (p2, st2)

    t_probe = chain_time(probe_body, (params, stats), n=4,
                         label="probe fwd+bwd+sgd (2B)", consts=(x2,))

    ema_src = jax.tree.map(lambda a: a + 1e-3, params)

    def gallery_body(i, c, x2_, ema_, st_):
        p, acc = c
        p2 = jax.tree.map(lambda a, b: 0.99 * a + 0.01 * b, p, ema_)
        emb, _ = model.apply({"params": p2, "batch_stats": st_}, x2_,
                             train=True, mutable=["batch_stats"])
        return (p2, acc + jnp.sum(emb) * 1e-6)

    t_gal = chain_time(gallery_body, (params, jnp.float32(0)), n=4,
                       label="gallery EMA+fwd (2B)",
                       consts=(x2, ema_src, stats))

    total = t_hfb + t_probe + t_gal
    print(f"\nsum of isolated passes: head fwd+bwd {t_hfb:.1f} + probe "
          f"{t_probe:.1f} + gallery {t_gal:.1f} = {total:.1f} ms "
          f"(full measured step: 164.26 ms -> residual "
          f"{164.26-total:.1f} ms for queue scatter/requant/DCP/metrics + "
          f"lost overlap)", flush=True)

    # ---- tile-width probe: does a 2048 stream tile (5120 grid steps vs
    # 8192 at the clamped 1280) pay?  The _twin_tile VMEM estimate books
    # ~10 f32 [B, tile] working buffers; if Mosaic's real allocation is
    # <=7, tile 2048 fits in the ~11 MB budget. Mosaic fails loudly if
    # not — this is exactly the experiment. ----
    if os.environ.get("FLOOR_TILE_PROBE", "1") == "1":
        import vlsfr_tpu.ops.twin_margin as tm
        orig = tm._twin_tile
        for wide in (2048, 2560):
            tm._twin_tile = lambda b_, d_, t_, qbytes=4, _w=wide: _w
            kw_w = dict(kw, tile=wide)

            def head_loss_w(e1, e2, q8_, qs_):
                la, lb = quad_add_margin(e1, e2, q8_, ga, gb,
                                         (rowsA, colsA, seenA),
                                         (rowsB, colsB, seenB), labA, labB,
                                         qscales=qs_, **kw_w)
                return la + lb

            grad_w = jax.value_and_grad(head_loss_w, argnums=(0, 1))

            def body_w(i, c, q8_, qs_):
                e1, e2 = c
                l, (g1, g2) = grad_w(e1, e2, q8_, qs_)
                return (e1 + 1e-9 * g1 + 1e-12 * l, e2 + 1e-9 * g2)

            try:
                t_w = chain_time(body_w, (ex, ey), n=4,
                                 label=f"head fwd+bwd tile={wide}",
                                 consts=(q8, qs))
                print(f"  tile {wide} vs 1280: {t_hfb-t_w:+.2f} ms",
                      flush=True)
            except Exception as e:  # Mosaic VMEM OOM is the expected fail
                print(f"  tile {wide}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:200]})", flush=True)
            finally:
                tm._twin_tile = orig


if __name__ == "__main__":
    main()
