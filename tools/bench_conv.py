"""Real-chip bench: bare Pallas 3×3 conv vs XLA's conv (verdict item 2).

Measures both modes (taps9 / im2col, ops/conv_pallas.py) against
lax.conv_general_dilated at the ir50-dominant shapes, bf16 operands,
plus the BN-stat-epilogue variant and the XLA conv+stats composition it
would replace. Results go to docs/PERF.md.

TIMING: the axon tunnel's ``block_until_ready`` returns without awaiting
device completion for non-donating graphs (measured: a 4096³ matmul
"finishing" at 1.7 PFLOP/s), so per-op timing here chains the op
``iters`` times inside ONE jit (``lax.fori_loop``, data-dependent) and
syncs with a scalar value fetch; two chain lengths cancel the constant
dispatch+fetch overhead.

Run in background (cold compiles through the tunnel take minutes):
    python tools/bench_conv.py
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

N_LONG, N_SHORT = 60, 12


def bench_chain(conv_fn, x, w):
    """Device seconds per op application, overhead-cancelled."""

    def make(iters):
        @jax.jit
        def chain(x0, wt):
            return jax.lax.fori_loop(
                0, iters, lambda i, y: conv_fn(y, wt), x0)
        return chain

    times = {}
    for iters in (N_SHORT, N_LONG):
        ch = make(iters)
        _ = float(jnp.sum(ch(x, w).astype(jnp.float32)))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(ch(x, w).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    return (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)


def main():
    from vlsfr_tpu.ops.conv_pallas import conv3x3_pallas, conv3x3_xla

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    shapes = [
        (128, 56, 56, 64),    # ir50 stage-1 block conv
        (128, 112, 112, 64),  # stem-adjacent (verdict's named shape)
        (128, 28, 28, 128),   # stage-2 block conv
    ]
    for b, h, w, c in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.045, jnp.bfloat16)
        flops = 2 * b * h * w * 9 * c * c
        t_xla = bench_chain(conv3x3_xla, x, wt)
        print(f"[{b},{h},{w},{c}]  XLA: {t_xla*1e3:.3f} ms  "
              f"{flops/t_xla/1e12:.1f} TFLOP/s  ({flops/t_xla/197e12:.2f} MXU)",
              flush=True)
        ref = jax.jit(conv3x3_xla)(x, wt)
        for mode in ("taps9", "im2col"):
            for strip in (14, 28, 56):
                if h % strip:
                    continue
                try:
                    fn = lambda xx, ww, m=mode, s=strip: conv3x3_pallas(  # noqa: E731
                        xx, ww, mode=m, strip=s)
                    err = float(jnp.max(jnp.abs(
                        fn(x, wt).astype(jnp.float32) - ref.astype(jnp.float32))))
                    t_p = bench_chain(fn, x, wt)
                    print(f"  pallas {mode} strip={strip}: {t_p*1e3:.3f} ms  "
                          f"{flops/t_p/1e12:.1f} TFLOP/s  "
                          f"({flops/t_p/197e12:.2f} MXU)  maxerr={err:.3g}",
                          flush=True)
                except Exception as e:
                    print(f"  pallas {mode} strip={strip}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # the fusion question: conv+BN-stats in one kernel vs XLA conv + stat
    # reduce (what the training graph actually runs)
    b, h, w, c = 128, 56, 56, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.045, jnp.bfloat16)
    flops = 2 * b * h * w * 9 * c * c

    def xla_conv_stats(xx, ww):
        y = conv3x3_xla(xx, ww)
        y32 = y.astype(jnp.float32)
        s1 = jnp.sum(y32.reshape(-1, c), axis=0)
        s2 = jnp.sum(jnp.square(y32).reshape(-1, c), axis=0)
        # keep the stats live in the chained graph (fold into the output)
        return y + (s1[None, None, None, :] * 0).astype(y.dtype) + (
            s2[None, None, None, :] * 0).astype(y.dtype)

    t_xs = bench_chain(xla_conv_stats, x, wt)
    print(f"XLA conv+stats: {t_xs*1e3:.3f} ms ({flops/t_xs/197e12:.2f} MXU-equiv)",
          flush=True)
    for strip in (28, 56):
        try:
            def fn(xx, ww, s=strip):
                y, (s1, s2) = conv3x3_pallas(xx, ww, mode="taps9", strip=s,
                                             with_stats=True)
                return y + (s1[None, None, None, :] * 0).astype(y.dtype) + (
                    s2[None, None, None, :] * 0).astype(y.dtype)
            t_ps = bench_chain(fn, x, wt)
            print(f"pallas taps9+stats strip={strip}: {t_ps*1e3:.3f} ms "
                  f"({flops/t_ps/197e12:.2f} MXU-equiv)", flush=True)
        except Exception as e:
            print(f"pallas stats strip={strip}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
