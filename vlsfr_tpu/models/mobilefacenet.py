"""MobileFaceNet backbone (112×112 → feat_dim L2-normalized embedding).

TPU-native (NHWC, flax) re-implementation of the architecture in the
reference /root/reference/model/mobilefacenet_def.py:18-123 (itself the
MobileFaceNets paper, arXiv 1804.07573): inverted-residual bottlenecks with
per-channel PReLU, a 7×7 depthwise "global" conv instead of pooling, and a
linear 1×1 projection to the embedding, all BN'd, ending in L2 normalization.

Stage table [expansion t, channels c, repeats n, stride s] matches
mobilefacenet_def.py:18-25. Default feat_dim=128 (mobilefacenet_def.py:78).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from vlsfr_tpu.models.layers import BatchNorm, Conv, PReLU, l2_normalize

# (expansion, channels, num_blocks, first_stride) — mobilefacenet_def.py:18-25
BOTTLENECK_SETTING = (
    (2, 64, 5, 2),
    (4, 128, 1, 2),
    (2, 128, 6, 1),
    (4, 128, 1, 2),
    (2, 128, 2, 1),
)


class ConvBlock(nn.Module):
    """conv → BN → (PReLU unless linear); optionally depthwise.

    Mirrors mobilefacenet_def.py:55-74.
    """

    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    padding: int
    dw: bool = False
    linear: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(
            self.out_ch,
            self.kernel,
            self.stride,
            self.padding,
            groups=self.in_ch if self.dw else 1,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, axis_name=self.axis_name,
              bn_stats_rows=self.bn_stats_rows, name="bn")(x, train)
        if not self.linear:
            x = PReLU(self.out_ch, dtype=self.dtype, name="prelu")(x)
        return x


class Bottleneck(nn.Module):
    """Inverted residual: 1×1 expand → 3×3 depthwise → 1×1 project.

    Residual connection iff stride==1 and in_ch==out_ch
    (mobilefacenet_def.py:27-52).
    """

    in_ch: int
    out_ch: int
    stride: int
    expansion: int
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.in_ch * self.expansion
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, bn_stats_rows=self.bn_stats_rows)
        y = ConvBlock(self.in_ch, mid, 1, 1, 0, name="expand", **kw)(x, train)
        y = ConvBlock(mid, mid, 3, self.stride, 1, dw=True, name="depthwise", **kw)(y, train)
        y = ConvBlock(mid, self.out_ch, 1, 1, 0, linear=True, name="project", **kw)(y, train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = x + y
        return y


class MobileFaceNet(nn.Module):
    """Input [B, 112, 112, 3] → [B, feat_dim] L2-normalized (fp32)."""

    feat_dim: int = 128
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0
    setting: Sequence[tuple] = BOTTLENECK_SETTING

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, bn_stats_rows=self.bn_stats_rows)
        x = x.astype(self.dtype)
        x = ConvBlock(3, 64, 3, 2, 1, name="conv1", **kw)(x, train)
        x = ConvBlock(64, 64, 3, 1, 1, dw=True, name="dw_conv1", **kw)(x, train)
        ch = 64
        idx = 0
        for t, c, n, s in self.setting:
            for i in range(n):
                stride = s if i == 0 else 1
                x = Bottleneck(ch, c, stride, t, name=f"blocks_{idx}", **kw)(x, train)
                ch = c
                idx += 1
        x = ConvBlock(128, 512, 1, 1, 0, name="conv2", **kw)(x, train)
        # 7×7 depthwise over the full 7×7 map — GDConv (mobilefacenet_def.py:88)
        x = ConvBlock(512, 512, 7, 1, 0, dw=True, linear=True, name="linear7", **kw)(x, train)
        x = ConvBlock(512, self.feat_dim, 1, 1, 0, linear=True, name="linear1", **kw)(x, train)
        x = x.reshape(x.shape[0], -1)
        return l2_normalize(x)
