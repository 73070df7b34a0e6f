"""IResNet (insightface/ArcFace-style ResNet) for 112×112 face crops.

TPU-native (NHWC, flax) re-implementation of the architecture in
/root/reference/model/resnet_arcface.py:26-184: BN-first basic blocks
(BN → 3×3 conv → BN → PReLU → 3×3 strided conv → BN + shortcut), a stride-1
3×3 stem, four stride-2 stages (112 → 7), and a head of
BN → flatten → dropout → Linear(512·49 → feat_dim) → BatchNorm1d with the
scale frozen at 1 (resnet_arcface.py:96-98) → L2 normalization.

Init matches resnet_arcface.py:100-105: conv kernels ~ N(0, 0.1); BN scale 1,
bias 0. The final fc runs in fp32 even under bf16 compute
(resnet_arcface.py:150).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from vlsfr_tpu.models.layers import BatchNorm, Conv, PReLU, l2_normalize

_conv_init = nn.initializers.normal(stddev=0.1)

DEPTHS = {
    "ir18": (2, 2, 2, 2),
    "ir34": (3, 4, 6, 3),
    "ir50": (3, 4, 14, 3),
    "ir100": (3, 13, 30, 3),
    "ir200": (6, 26, 60, 6),
}


class IBasicBlock(nn.Module):
    """BN-first residual block (resnet_arcface.py:26-55)."""

    in_ch: int
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, bn_stats_rows=self.bn_stats_rows)
        y = BatchNorm(name="bn1", **kw)(x, train)
        y = Conv(self.planes, 3, 1, 1, kernel_init=_conv_init, dtype=self.dtype, name="conv1")(y)
        y = BatchNorm(name="bn2", **kw)(y, train)
        y = PReLU(self.planes, dtype=self.dtype, name="prelu")(y)
        y = Conv(self.planes, 3, self.stride, 1, kernel_init=_conv_init, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(name="bn3", **kw)(y, train)
        if self.stride != 1 or self.in_ch != self.planes:
            sc = Conv(self.planes, 1, self.stride, 0, kernel_init=_conv_init, dtype=self.dtype, name="downsample_conv")(x)
            sc = BatchNorm(name="downsample_bn", **kw)(sc, train)
        else:
            sc = x
        return y + sc


class IResNet(nn.Module):
    """Input [B, 112, 112, 3] → [B, feat_dim] L2-normalized (fp32)."""

    layers: Sequence[int] = DEPTHS["ir50"]
    feat_dim: int = 512
    dropout: float = 0.0
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, bn_stats_rows=self.bn_stats_rows)
        x = x.astype(self.dtype)
        x = Conv(64, 3, 1, 1, kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(name="bn1", **kw)(x, train)
        x = PReLU(64, dtype=self.dtype, name="prelu")(x)
        in_ch = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers), start=1):
            for i in range(blocks):
                stride = 2 if i == 0 else 1  # every stage downsamples (resnet_arcface.py:77-92)
                x = IBasicBlock(
                    in_ch, planes, stride, name=f"layer{stage}_{i}", **kw
                )(x, train)
                in_ch = planes
        x = BatchNorm(name="bn2", **kw)(x, train)
        # NHWC flatten differs from torch's NCHW flatten; the weight converter
        # (models/torch_import.py) permutes fc rows to compensate.
        x = x.reshape(x.shape[0], -1)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        # fc in fp32 (resnet_arcface.py:150)
        x = nn.Dense(
            self.feat_dim,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            name="fc",
        )(x.astype(jnp.float32))
        # "features" BN1d: scale frozen at 1.0 => use_scale=False (resnet_arcface.py:96-98)
        x = BatchNorm(use_scale=False, dtype=jnp.float32, axis_name=self.axis_name, name="features")(x, train)
        return l2_normalize(x)
