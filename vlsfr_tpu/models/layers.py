"""Shared layer primitives for the face-recognition backbones.

TPU-first conventions used by every model in this package:

* **NHWC layout** (XLA's native conv layout on TPU) — the reference is NCHW
  torch (util/lmdb_loader.py:127 produces CHW); the converter in
  models/torch_import.py transposes weights accordingly.
* **Explicit padding tuples** matching torch's symmetric Conv2d padding.
  (XLA's ``SAME`` is asymmetric for even strides and would break numerical
  parity with the reference.)
* **bf16 compute / fp32 params**: ``dtype`` controls activation/conv compute,
  ``param_dtype`` stays float32. BatchNorm statistics are always computed in
  float32 regardless of ``dtype`` — the TPU replacement for the reference's
  fp16 AMP + GradScaler (main.py:64,133).
* **Per-channel PReLU** with trainable slope per channel (torch
  ``nn.PReLU(C)`` semantics; flax's builtin PReLU is scalar-slope only).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_default_conv_init() -> Callable:
    """torch's default Conv2d init: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
    i.e. variance_scaling(1/3, fan_in, uniform)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_linear_init() -> Callable:
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch nn.PReLU(num_parameters=C))."""

    features: int
    init_slope: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", nn.initializers.constant(self.init_slope), (self.features,), jnp.float32
        )
        alpha = alpha.astype(self.dtype)
        return jnp.where(x >= 0, x, alpha * x).astype(self.dtype)


class _SubsetBN(nn.Module):
    """Manual BatchNorm whose TRAINING statistics come from a strided subset
    of the batch rows (``stats_rows`` of them, spread evenly so each data
    shard contributes equally under GSPMD).

    Why: the BN batch-stat reduces over the stem activations are ~11% of the
    FFC step on v5e (docs/PERF.md) — a pure HBM re-read that XLA cannot fuse
    into the producing conv. With 112² spatial positions per sample, 32 rows
    still average >400k samples per channel, so the estimate stays tight
    (ghost-BN-style subsampling; flag-gated, default off).

    Variable layout (params: scale/bias; batch_stats: mean/var) is identical
    to flax nn.BatchNorm — checkpoints and torch imports are interchangeable.
    """

    stats_rows: int
    use_scale: bool = True
    use_bias: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            b = x.shape[0]
            stride = max(b // max(self.stats_rows, 1), 1)
            sub = x[::stride]
            axes = tuple(range(sub.ndim - 1))
            mean = jnp.mean(sub, axes)
            mean2 = jnp.mean(jnp.square(sub), axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # same EMA rule as flax nn.BatchNorm (biased batch var)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", self.scale_init, (feat,), jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        return y


class BatchNorm(nn.Module):
    """BatchNorm2d/1d with float32 statistics and torch-compatible defaults.

    torch BN: momentum 0.1 (new stats weight) <-> flax momentum 0.9 (EMA keep).
    ``axis_name`` enables cross-device (sync) BN: batch statistics are averaged
    over the named mesh axis — the real implementation of the reference's dead
    ``--sync_bn`` flag (main.py:162).

    ``bn_stats_rows > 0`` switches to :class:`_SubsetBN`: training statistics
    from a strided row subset (perf flag; identical variable layout).
    """

    use_scale: bool = True
    use_bias: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    scale_init: Callable = nn.initializers.ones
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.bn_stats_rows > 0:
            norm = _SubsetBN(
                stats_rows=self.bn_stats_rows,
                use_scale=self.use_scale,
                use_bias=self.use_bias,
                momentum=self.momentum,
                epsilon=self.epsilon,
                scale_init=self.scale_init,
                name="bn",
            )
            return norm(x.astype(jnp.float32), use_running_average=not train).astype(self.dtype)
        norm = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=jnp.float32,  # stats + affine in fp32
            param_dtype=jnp.float32,
            axis_name=self.axis_name if train else None,
            scale_init=self.scale_init,
            name="bn",
        )
        return norm(x.astype(jnp.float32)).astype(self.dtype)


class Conv(nn.Module):
    """2D conv with torch-style symmetric padding, no bias by default."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        conv = nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init or torch_default_conv_init(),
            name="conv",
        )
        return conv(x)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(dim=-1) semantics: x / max(||x||_2, eps), in fp32."""
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def max_pool_torch(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Max-pool with torch-style symmetric padding (pads with -inf)."""
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
