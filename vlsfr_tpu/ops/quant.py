"""Int8 inference path for the gallery (EMA) backbone forward.

Why: the FFC gallery net is a no-gradient EMA copy whose forward is ~1/4
of the step's conv FLOPs (fwd-equivalents: probe fwd 1 + gallery fwd 1 +
probe bwd 2), and v5e's MXU runs int8×int8→int32 convs at 1.5-3.6× the
bf16 rate at the ir50-dominant shapes (measured, tools/bench_int8.py →
docs/PERF.md round 3). The reference has no analogue (its gallery forward
is fp16 AMP, /root/reference/ffc.py:150-160); this is a TPU-hardware
lever, flag-gated and default-off (``pool.gallery_int8``).

Scheme — dynamic symmetric quantization, chosen so there is NO
calibration state to manage:

* weights: per-OUTPUT-CHANNEL scale (max|w| over k·k·cin per cout).
  Per-channel is what moved the ir50 drift from 0.995 (per-tensor, the
  round-3 study's pessimistic bound) inside the repo's 0.999 fidelity
  gate.
* activations: per-TENSOR dynamic scale (max|x| of this very tensor) —
  exact by construction, recomputed each call. The extra max-reduce is a
  VPU pass XLA fuses into the producer epilogue; measured cost on the
  real chip is in docs/PERF.md.
* conv: int8×int8 → int32 accumulate (``preferred_element_type``), then
  one fused dequant multiply (sx·sw[cout]) back to the module dtype.
  Symmetric quantization keeps the zero point at 0, so the conv's
  zero-padding stays exact.

Mechanism: a flax method interceptor (``nn.intercept_methods``) that
rewrites eligible ``nn.Conv.__call__``s while leaving the module/param
tree BIT-IDENTICAL (the kernel param is created through the intercepted
module's own scope — tests/test_quant.py pins tree equality). Eligible =
ungrouped 2D convs without dilation/mask; depthwise convs (MobileFaceNet
``dw``/GDConv) fall through to the normal path — they are VPU-bound, not
MXU-bound, and int8 buys nothing there.

Usage::

    with int8_conv_inference():
        emb, mut = model.apply(variables, x, train=True, mutable=[...])

The context is trace-time: wrap the ``model.apply`` that should lower to
int8 convs (core/ffc.py gallery_fwd under ``cfg.pool.gallery_int8``).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_weight_per_channel(w: jnp.ndarray):
    """[..., cout] float kernel -> (int8 kernel, f32 scale[cout]).

    Symmetric per-output-channel: scale = max|w|/127 over all axes but the
    last."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_act_per_tensor(x: jnp.ndarray):
    """float activation -> (int8 activation, f32 scalar scale), dynamic
    symmetric per-tensor."""
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _canon2(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _eligible(m: nn.Conv, x: jnp.ndarray) -> bool:
    return (
        x.ndim == 4
        and m.feature_group_count == 1
        and m.mask is None
        and _canon2(m.kernel_dilation) == (1, 1)
        and _canon2(m.input_dilation) == (1, 1)
        and not isinstance(m.padding, str)  # layers.Conv uses explicit pads
    )


def _int8_conv_call(m: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    ks = _canon2(m.kernel_size)
    kernel_shape = ks + (x.shape[-1], m.features)
    # created through the module's own scope — same name/shape/init as
    # flax nn.Conv.__call__, so the param tree is unchanged
    kernel = m.param("kernel", m.kernel_init, kernel_shape, m.param_dtype)
    out_dtype = m.dtype or x.dtype
    x32 = x.astype(jnp.float32)
    w32 = kernel.astype(jnp.float32)
    # SmoothQuant-style channel equalization (arXiv 2211.10438 idea, α=0.5):
    # per-input-channel activation ranges vary a lot in convnets, and a
    # per-tensor activation scale wastes most of the 8-bit grid on the
    # quiet channels (measured: ir50 drift 0.991 without this). Migrate
    # half the per-channel dynamic range into the weights —
    # x/s[c], w·s[c] is exact in f32 — then quantize both. The scalar
    # absmax of x/s is max_c(ax/s) from the SAME per-channel reduce, so
    # this costs no extra pass over the activation.
    ax = jnp.max(jnp.abs(x32), axis=(0, 1, 2))          # [cin]
    aw_in = jnp.max(jnp.abs(w32), axis=(0, 1, 3))       # [cin]
    s = jnp.sqrt(jnp.maximum(ax, 1e-12) / jnp.maximum(aw_in, 1e-12))
    s = jnp.where((ax > 0) & (aw_in > 0), s, 1.0)
    sx = jnp.maximum(jnp.max(ax / s), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / (s * sx)), -127, 127).astype(jnp.int8)
    wq, sw = quantize_weight_per_channel(w32 * s[None, None, :, None])
    y = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=_canon2(m.strides),
        padding=tuple(tuple(p) for p in m.padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if m.use_bias:
        bias = m.param("bias", m.bias_init, (m.features,), m.param_dtype)
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _int8_interceptor(next_fun, args, kwargs, context):
    m = context.module
    if (context.method_name == "__call__" and isinstance(m, nn.Conv)
            and len(args) == 1 and _eligible(m, args[0])):
        return _int8_conv_call(m, args[0])
    return next_fun(*args, **kwargs)


@contextmanager
def int8_conv_inference():
    """Trace-time context: eligible nn.Conv calls lower to int8×int8→int32
    convs with dynamic symmetric quantization (see module docstring)."""
    with nn.intercept_methods(_int8_interceptor):
        yield
