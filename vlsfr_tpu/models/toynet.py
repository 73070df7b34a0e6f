"""ToyNet: minimal conv backbone for tests, demos, and CI.

Not in the reference (its smallest net is MobileFaceNet at 112²). ToyNet
accepts any input size ≥ 16, compiles in seconds on CPU, and honors the same
embedding contract as the real backbones (L2-normalized fp32 [B, feat_dim]).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vlsfr_tpu.models.layers import BatchNorm, Conv, PReLU, l2_normalize


class ToyNet(nn.Module):
    feat_dim: int = 64
    dtype: Any = jnp.float32
    axis_name: str | None = None
    bn_stats_rows: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, bn_stats_rows=self.bn_stats_rows)
        x = x.astype(self.dtype)
        x = Conv(16, 3, 2, 1, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(name="bn1", **kw)(x, train)
        x = PReLU(16, dtype=self.dtype, name="prelu1")(x)
        x = Conv(32, 3, 2, 1, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm(name="bn2", **kw)(x, train)
        x = PReLU(32, dtype=self.dtype, name="prelu2")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.feat_dim, dtype=jnp.float32, param_dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32)
        )
        x = BatchNorm(dtype=jnp.float32, axis_name=self.axis_name, name="features")(x, train)
        return l2_normalize(x)
