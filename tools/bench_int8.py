"""Int8 gallery-forward study (round-2 verdict item 9).

The FFC gallery net is a frozen EMA copy whose forward is ~1/3 of the
step's conv FLOPs and needs no gradients — a quantization candidate:
v5e's MXU runs int8 at 394 TOPS vs 197 TFLOP/s bf16 (2×).

Three questions, measured in order:
1. does XLA on v5e actually emit fast int8 convs? (bench: int8×int8→int32
   lax.conv vs the bf16 conv at the ir50-dominant shapes; chained-in-jit
   timing — see tools/bench_conv.py for why);
2. what embedding drift does per-tensor symmetric int8 weight+activation
   quantization of the gallery forward cause? (cosine between bf16 and
   int8-simulated embeddings, mobile + ir50);
3. only if 1 wins and 2 is small: wire it into the FFC step.

Run in background:  python tools/bench_int8.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# the shared overhead-cancelling chained-in-jit timing harness (single
# source of truth — the tunnel-sync methodology must not fork)
from bench_conv import bench_chain  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")


def conv_bf16(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)


def conv_int8(x, w):
    # int8 operands, int32 accumulate; requantize back to int8 with a
    # shift so the chain stays int8 (keeps every iteration int8-in)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)


def q1_throughput():
    rng = np.random.default_rng(0)
    for (b, h, w, c) in ((128, 56, 56, 64), (128, 28, 28, 128)):
        flops = 2 * b * h * w * 9 * c * c
        xb = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.045, jnp.bfloat16)
        t_b = bench_chain(conv_bf16, xb, wb)
        xi = jnp.asarray(rng.integers(-100, 100, (b, h, w, c)), jnp.int8)
        wi = jnp.asarray(rng.integers(-100, 100, (3, 3, c, c)), jnp.int8)
        try:
            t_i = bench_chain(conv_int8, xi, wi)
            print(f"conv [{b},{h},{w},{c}]: bf16 {t_b*1e3:.3f} ms "
                  f"({flops/t_b/1e12:.0f} TF/s) | int8 {t_i*1e3:.3f} ms "
                  f"({flops/t_i/1e12:.0f} TOP/s) | speedup {t_b/t_i:.2f}x",
                  flush=True)
        except Exception as e:
            print(f"conv [{b},{h},{w},{c}]: int8 FAILED {str(e)[:200]}", flush=True)


def q2_drift(net="mobile"):
    """Per-tensor symmetric int8 weight+activation quantization of every
    conv/fc kernel: embedding cosine drift vs the bf16 forward."""
    from flax import traverse_util

    from vlsfr_tpu.models import create_net, native_image_size

    size = native_image_size(net)
    fd = 128 if net == "mobile" else 512
    model = create_net(net, feat_dim=fd)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, size, size, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # calibrate BN running stats — random-init nets explode in eval mode
    # (same trick as tools/compare_reference.py)
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = dict(variables, batch_stats=mut["batch_stats"])

    def quant(v):
        s = jnp.max(jnp.abs(v)) / 127.0
        return (jnp.round(v / s).clip(-127, 127) * s).astype(v.dtype)

    flat = traverse_util.flatten_dict(variables["params"])
    qflat = {k: (quant(v) if k[-1] in ("kernel",) and v.ndim >= 2 else v)
             for k, v in flat.items()}
    qvars = dict(variables, params=traverse_util.unflatten_dict(qflat))
    e0 = np.asarray(model.apply(variables, x, train=False))
    e1 = np.asarray(model.apply(qvars, x, train=False))
    cos = np.sum(e0 * e1, -1) / (np.linalg.norm(e0, axis=-1) * np.linalg.norm(e1, axis=-1))
    print(f"{net}: weight-only int8 gallery drift: cosine min={cos.min():.5f} "
          f"mean={cos.mean():.5f}", flush=True)


def q3_real_path_drift(net="ir50"):
    """Drift of the SHIPPED int8 path (ops/quant.py: per-channel weights +
    dynamic per-tensor activations, depthwise fall-through) — the number
    that gates cfg.pool.gallery_int8 against the 0.999 cosine bar."""
    from vlsfr_tpu.models import create_net, native_image_size
    from vlsfr_tpu.ops.quant import int8_conv_inference

    size = native_image_size(net)
    fd = 128 if net == "mobile" else 512
    model = create_net(net, feat_dim=fd)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, size, size, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = dict(variables, batch_stats=mut["batch_stats"])
    e0 = np.asarray(model.apply(variables, x, train=False), np.float32)
    with int8_conv_inference():
        e1 = np.asarray(
            jax.jit(lambda v, d: model.apply(v, d, train=False))(variables, x),
            np.float32)
    cos = np.sum(e0 * e1, -1) / (np.linalg.norm(e0, axis=-1)
                                 * np.linalg.norm(e1, axis=-1))
    print(f"{net}: REAL int8 path drift (per-channel w + dyn act): "
          f"cosine min={cos.min():.5f} mean={cos.mean():.5f}", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    q1_throughput()
    q2_drift("mobile")
    q2_drift("ir50")
    q3_real_path_drift("mobile")
    q3_real_path_drift("ir50")


if __name__ == "__main__":
    main()
