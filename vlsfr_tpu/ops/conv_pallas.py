"""EXPERIMENT: bare Pallas 3×3 conv vs XLA's conv (round-2 verdict item 2).

The framework's MFU ceiling is the ir50 conv stack (reference hot path
/root/reference/model/resnet_arcface.py:26-55 via cuDNN; here XLA's own
NHWC convs). The twice-deferred question: can a hand Pallas conv match
XLA's conv — because only then is fusing the BN-stat accumulation into a
conv epilogue (saving one activation read per BN) worth pursuing.

This module is the measured attempt. Design (v5e, NHWC, bf16 operands,
f32 accumulate):

* the input is padded once in XLA ([B, H+2, W+2, C] — one fused pad;
  XLA's conv pads virtually, so this hands the Pallas kernel a small
  traffic advantage, noted in the writeup);
* grid (B, H/S); the halo problem (overlapping [S+2]-row strips can't be
  expressed as disjoint BlockSpec blocks) is solved by streaming the SAME
  padded input through TWO block pipelines: the [S]-row main strip and a
  [2]-row halo strip starting at row (s+1)·S — Mosaic double-buffers both
  automatically (the first manual-DMA version crashed Mosaic: sliced DMA
  from a lane-padded C=64 HBM memref is unsupported);
* the 3×3 kernel runs as 9 accumulating MXU dots per strip —
  A(dy,dx) [S·W, C] @ W(dy,dx) [C, Cout] — no im2col copy: every A is a
  static slice of the halo-extended strip already in VMEM ("taps9"); or
  one [S·W, 9C] @ [9C, Cout] dot after an in-VMEM concat ("im2col");
* BN-stat epilogue (``with_stats``): per-channel Σx and Σx² accumulated in
  VMEM f32 scratch across grid steps — the fusion candidate this
  experiment exists to evaluate.

Results (tools/bench_conv.py, real v5e) are recorded in docs/PERF.md;
tests/test_conv_pallas.py checks interpret-mode parity vs
lax.conv_general_dilated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_conv_kernel(s, h, w, c, cout, mode, with_stats):
    n_strips = h // s

    def kernel(w_ref, main_ref, halo_ref, *rest):
        if with_stats:
            out_ref, stats_ref, stats_scr = rest
        else:
            (out_ref,) = rest
            stats_ref = stats_scr = None
        n = pl.program_id(0)
        si = pl.program_id(1)

        strip = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)  # [S+2, W+2, C]
        if mode == "taps9":
            acc = jnp.zeros((s * w, cout), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    a = strip[dy:dy + s, dx:dx + w, :].reshape(s * w, c)
                    wk = w_ref[(dy * 3 + dx) * c:(dy * 3 + dx + 1) * c, :]
                    acc = acc + jnp.dot(a, wk, preferred_element_type=jnp.float32)
        else:  # im2col: one big-K dot
            a = jnp.concatenate(
                [strip[dy:dy + s, dx:dx + w, :].reshape(s * w, c)
                 for dy in range(3) for dx in range(3)], axis=1)
            acc = jnp.dot(a, w_ref[:], preferred_element_type=jnp.float32)

        out_ref[0] = acc.reshape(s, w, cout).astype(out_ref.dtype)

        if with_stats:
            # BN-stat epilogue: per-channel running Σx, Σx² over the
            # activations this kernel just produced (rows 2-7 pad the
            # Mosaic block)
            @pl.when((n == 0) & (si == 0))
            def _init():
                stats_scr[:] = jnp.zeros_like(stats_scr)

            flat = acc.reshape(s * w, cout)
            stats_scr[0:1, :] = stats_scr[0:1, :] + jnp.sum(flat, axis=0,
                                                            keepdims=True)
            stats_scr[1:2, :] = stats_scr[1:2, :] + jnp.sum(
                jnp.square(flat), axis=0, keepdims=True)

            @pl.when((n == pl.num_programs(0) - 1) & (si == n_strips - 1))
            def _emit():
                stats_ref[:] = stats_scr[:]

    return kernel


@partial(jax.jit, static_argnames=("mode", "strip", "with_stats", "interpret"))
def conv3x3_pallas(x, w, *, mode="taps9", strip=28, with_stats=False,
                   interpret=False):
    """3×3 stride-1 SAME conv, NHWC.  x [B, H, W, C], w [3, 3, C, Cout].

    Returns y [B, H, W, Cout] (x.dtype), plus (sum, sumsq) [Cout] f32 when
    ``with_stats``. Experimental — see module docstring."""
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    assert h % strip == 0, (h, strip)
    # The halo BlockSpec below indexes in 2-row block units ((si+1)·S/2),
    # which only lands on row (si+1)·S when S is even — an odd strip would
    # silently read the wrong two halo rows.
    assert strip % 2 == 0, ("strip must be even (halo block index is in "
                            "2-row units)", strip)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * c, cout).astype(x.dtype)
    kernel = _make_conv_kernel(strip, h, wd, c, cout, mode, with_stats)
    s = strip
    out_specs = [pl.BlockSpec((1, strip, wd, cout), lambda n, si: (n, si, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype)]
    if with_stats:
        out_specs.append(pl.BlockSpec((8, cout), lambda n, si: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((8, cout), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(b, h // strip),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            # main strip: rows [si·S, si·S+S) of the padded input
            pl.BlockSpec((1, strip, wd + 2, c), lambda n, si: (n, si, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo strip: rows [si·S+S, si·S+S+2) — same array, second
            # stream; block index (s+1)·S/2 in 2-row units
            pl.BlockSpec((1, 2, wd + 2, c),
                         lambda n, si: (n, (si + 1) * (s // 2), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, cout), jnp.float32)] if with_stats else [],
        interpret=interpret,
    )(wf, xp, xp)
    if with_stats:
        y, stats = out
        return y, (stats[0], stats[1])
    return out[0]


def conv3x3_xla(x, w):
    """The XLA reference conv for the same contract (NHWC, SAME, stride 1)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
