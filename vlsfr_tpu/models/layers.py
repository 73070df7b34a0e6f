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


class BatchNorm(nn.Module):
    """BatchNorm2d/1d with float32 statistics and torch-compatible defaults.

    torch BN: momentum 0.1 (new stats weight) <-> flax momentum 0.9 (EMA keep).
    ``axis_name`` enables cross-device (sync) BN: batch statistics are averaged
    over the named mesh axis — the real implementation of the reference's dead
    ``--sync_bn`` flag (main.py:162).
    """

    use_scale: bool = True
    use_bias: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
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
