"""Probe: does Mosaic lower int8xint8->int32 dots on the MXU, and at what
throughput vs bf16? Gates the int8-compute quad-head work (docs/PERF.md
round 3 int8-queue section: the giant-Q head is MXU-bound).

Timing uses the chain-in-jit methodology (CLAUDE.md): N data-dependent
kernel calls inside one jit via fori_loop, scalar value-fetch sync, two
chain lengths to cancel overhead. The int8 operand is PERTURBED per
iteration (XLA hoists loop-invariant converts out of fori_loop bodies —
the bench_gallery.py gotcha).

Run on the real chip: python tools/probe_int8_mxu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")

B, D, T, NT = 128, 512, 1024, 512  # ir50 head shapes, 512 tiles = q512k


def _kernel_int8(a_ref, b_ref, o_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jax.lax.dot_general(
        a_ref[:], b_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = o_ref[:] + acc


def _kernel_bf16(a_ref, b_ref, o_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jax.lax.dot_general(
        a_ref[:], b_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = o_ref[:] + acc


def _kernel_i8st_bf16dot(a_ref, b_ref, o_ref):
    """Today's int8-queue path: int8 tile converted to bf16, bf16 MXU dot."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jax.lax.dot_general(
        a_ref[:], b_ref[0].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = o_ref[:] + acc


def make_call(dtype, out_dtype, kernel):
    return pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((B, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, T), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), out_dtype),
    )


def chain_time(call, a, w, n):
    @jax.jit
    def run(a0):
        def body(i, carry):
            a_i = (carry + i.astype(carry.dtype)).astype(carry.dtype)
            o = call(a_i, w)
            # fold the output back into the operand: a RUNTIME-tiny add
            # (not 0*red — XLA constant-folds that and severs the chain)
            red = o[:, :a0.shape[1]].astype(jnp.float32)
            return (a_i.astype(jnp.float32) + red * 1e-30).astype(a0.dtype)

        return jnp.sum(jax.lax.fori_loop(0, n, body, a0).astype(jnp.float32))

    float(run(a))  # compile+warm
    t0 = time.perf_counter()
    v = float(run(a))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    return dt


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (B, D)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (NT, T, D)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    wbf = jnp.asarray(rng.standard_normal((NT, T, D)), jnp.bfloat16)

    call8 = make_call(jnp.int8, jnp.int32, _kernel_int8)
    callbf = make_call(jnp.bfloat16, jnp.float32, _kernel_bf16)
    call_mix = make_call(jnp.int8, jnp.float32, _kernel_i8st_bf16dot)

    # correctness vs XLA int32 reference
    out8 = np.asarray(jax.jit(call8)(a8, w8))
    ref = np.zeros((B, T), np.int64)
    w_np = np.asarray(w8, np.int64)
    a_np = np.asarray(a8, np.int64)
    for t in range(NT):
        ref += a_np @ w_np[t].T
    np.testing.assert_array_equal(out8.astype(np.int64), ref)
    print("int8 kernel CORRECT (exact int32 accumulation)", flush=True)

    flops = 2.0 * B * D * T * NT
    for name, call, a, w in (("bf16_storage_bf16_dot", callbf, abf, wbf),
                             ("int8_storage_bf16_dot", call_mix, abf, w8),
                             ("int8_storage_int8_dot", call8, a8, w8)):
        t2 = chain_time(call, a, w, 2)
        t10 = chain_time(call, a, w, 10)
        per = (t10 - t2) / 8
        print(f"{name}: {per*1e3:.3f} ms/pass  "
              f"{flops/per/1e12:.1f} TOP/s  "
              f"(chain2 {t2*1e3:.1f} ms, chain10 {t10*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
