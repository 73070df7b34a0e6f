"""Standard ResNet v1.5 backbone for 224×224 inputs (default ``r50``).

TPU-native (NHWC, flax) re-implementation of the architecture in
/root/reference/model/resnet_std.py:17-263 — torchvision-style ResNet with a
7×7/s2 stem + 3×3/s2 max-pool, BasicBlock (r18/r34) or Bottleneck (r50/r101)
stages, and the face-embedding head the reference grafts on: flatten the 7×7
map → Linear(512·expansion·49 → feat_dim) → BatchNorm1d → L2 normalize
(resnet_std.py:200-203; no global average pool).

Conv init is kaiming-normal fan_out (resnet_std.py:146-151); optional
zero-init of each block's last BN scale (resnet_std.py:156-161).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from vlsfr_tpu.models.layers import BatchNorm, Conv, PReLU, l2_normalize, max_pool_torch

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

DEPTHS = {
    "r18": ("basic", (2, 2, 2, 2)),
    "r34": ("basic", (3, 4, 6, 3)),
    "r50": ("bottleneck", (3, 4, 6, 3)),
    "r101": ("bottleneck", (3, 4, 23, 3)),
}


class BasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN + shortcut (resnet_std.py:17-54)."""

    expansion = 1
    in_ch: int
    planes: int
    stride: int = 1
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, bn_stats_rows=self.bn_stats_rows)
        y = Conv(self.planes, 3, self.stride, 1, kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(name="bn1", **kw)(y, train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, 1, 1, kernel_init=_conv_init, dtype=self.dtype, name="conv2")(y)
        bn2_scale = nn.initializers.zeros if self.zero_init_residual else nn.initializers.ones
        y = BatchNorm(scale_init=bn2_scale, name="bn2", **kw)(y, train)
        if self.stride != 1 or self.in_ch != self.planes:
            sc = Conv(self.planes, 1, self.stride, 0, kernel_init=_conv_init, dtype=self.dtype, name="downsample_conv")(x)
            sc = BatchNorm(name="downsample_bn", **kw)(sc, train)
        else:
            sc = x
        return nn.relu(y + sc)


class Bottleneck(nn.Module):
    """1x1 reduce → 3x3 (stride) → 1x1 expand×4 (resnet_std.py:57-103, v1.5:
    the stride lives on the 3x3 conv)."""

    expansion = 4
    in_ch: int
    planes: int
    stride: int = 1
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.planes * self.expansion
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, bn_stats_rows=self.bn_stats_rows)
        y = Conv(self.planes, 1, 1, 0, kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(name="bn1", **kw)(y, train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, self.stride, 1, kernel_init=_conv_init, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(name="bn2", **kw)(y, train)
        y = nn.relu(y)
        y = Conv(out_ch, 1, 1, 0, kernel_init=_conv_init, dtype=self.dtype, name="conv3")(y)
        bn3_scale = nn.initializers.zeros if self.zero_init_residual else nn.initializers.ones
        y = BatchNorm(scale_init=bn3_scale, name="bn3", **kw)(y, train)
        if self.stride != 1 or self.in_ch != out_ch:
            sc = Conv(out_ch, 1, self.stride, 0, kernel_init=_conv_init, dtype=self.dtype, name="downsample_conv")(x)
            sc = BatchNorm(name="downsample_bn", **kw)(sc, train)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNet(nn.Module):
    """Input [B, 224, 224, 3] → [B, feat_dim] L2-normalized (fp32)."""

    block: str = "bottleneck"  # basic | bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    feat_dim: int = 512
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = block_cls.expansion
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, bn_stats_rows=self.bn_stats_rows)
        x = x.astype(self.dtype)
        x = Conv(64, 7, 2, 3, kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(name="bn1", **kw)(x, train)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)
        in_ch = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers), start=1):
            for i in range(blocks):
                stride = (2 if stage > 1 else 1) if i == 0 else 1
                x = block_cls(
                    in_ch,
                    planes,
                    stride,
                    zero_init_residual=self.zero_init_residual,
                    name=f"layer{stage}_{i}",
                    **kw,
                )(x, train)
                in_ch = planes * expansion
        # head: flatten 7×7×(512·e) → fc → BN1d → normalize (resnet_std.py:200-203)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(
            self.feat_dim,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            name="fc",
        )(x.astype(jnp.float32))
        x = BatchNorm(dtype=jnp.float32, axis_name=self.axis_name, name="features")(x, train)
        return l2_normalize(x)
