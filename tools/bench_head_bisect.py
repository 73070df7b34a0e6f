"""Intra-kernel bisect of the capacity head FORWARD (round-4 verdict
item 3, floor analysis).

Per-op profilers see a Pallas kernel as ONE opaque custom call, so the
~12 us/tile gap between the measured quad forward and its DMA+MXU floor
(tools/bench_capacity_floor.py SOL lines) cannot be attributed from a
trace. Instead this tool compiles ABLATED variants of the clean-tile
epilogue (ops/twin_margin._ABLATE, env VLSFR_HEAD_ABLATE — stages are
stubbed out at trace time, producing wrong losses by construction) and
measures each on the real chip; differences between consecutive ladder
rungs price each stage:

    ""                   full forward            (baseline)
    "topk"               - running top-k needs/merge
    "topk,exp"           - softmax exp (identity stand-in)
    "topk,exp,mask"      - neg_ok where-mask
    "topk,exp,mask,deq"  - int8-compute post-dot dequant multiply
                           => dot + sum + s_scr adds ~ DMA/MXU floor

_ABLATE is read once at module import, so every variant runs in a fresh
subprocess (invoke with --all). Timing per the round-3 tunnel gotcha:
chained fori_loop with a true data dependency, scalar value-fetch sync,
two chain lengths (chain_time from tools/bench_capacity_floor.py).

Run on the axon chip, background, no timeout:
    python tools/bench_head_bisect.py --all
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LADDER = ["", "topk", "topk,exp", "topk,exp,mask", "topk,exp,mask,deq"]

B = 128
D = 512
Q = 10 << 20
K = 10


def run_one():
    ablate = os.environ.get("VLSFR_HEAD_ABLATE", "")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")

    from bench_capacity_floor import chain_time

    from vlsfr_tpu.core.ffc import init_queue
    from vlsfr_tpu.ops.twin_margin import _ABLATE, quad_add_margin

    assert _ABLATE == frozenset(filter(None, ablate.split(","))), _ABLATE
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
        return (rows, cols, seen), labels

    plan_a, lab_a = plan()
    plan_b, lab_b = plan()

    # proven fused 10.5M int8 init (core/ffc.py init_queue — no reshape
    # between norm and quantize, see bench_capacity_floor.py)
    q8, qs = init_queue(jax.random.PRNGKey(1), Q, D, jnp.int8)

    def head_fwd_body(i, c, q8_, qs_):
        e1, e2 = c
        la, lb = quad_add_margin(
            e1, e2, q8_, ga, gb, plan_a, plan_b, lab_a, lab_b,
            loss_type="Arc", margin=0.5, scale=32.0, hard_neg=K,
            use_pallas=True, qscales=qs_, int8_compute=True, tile=1280)
        l = la + lb
        return (e1 + 1e-12 * l, e2 - 1e-12 * l)

    dt = chain_time(head_fwd_body, (ex, ey), n=4,
                    label=f"head fwd ablate='{ablate}'", consts=(q8, qs))
    return dt


def main():
    if "--all" in sys.argv:
        for ablate in LADDER:
            env = dict(os.environ, VLSFR_HEAD_ABLATE=ablate)
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True)
            out = [l for l in proc.stdout.splitlines() if "ms/iter" in l]
            print(out[-1] if out else
                  f"ablate='{ablate}' FAILED rc={proc.returncode}: "
                  f"{proc.stderr[-400:]}",
                  f"  [wall {time.time()-t0:.0f}s]", flush=True)
        return
    run_one()


if __name__ == "__main__":
    main()
