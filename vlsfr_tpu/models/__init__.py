"""Backbone registry (reference model/__init__.py:6-10, extended).

``create_net(net_type, ...)`` returns an un-initialized flax Module whose
``__call__(x_nhwc, train)`` yields [B, feat_dim] L2-normalized fp32
embeddings. Registered types:

* ``mobile``                         — MobileFaceNet, 112×112
* ``ir18/ir34/ir50/ir100/ir200``     — IResNet (ArcFace-style), 112×112
* ``r18/r34/r50/r101``               — standard ResNet v1.5, 224×224

The reference registers only {ir50, r50, mobile} (model/__init__.py:6-10);
the depth variants its model files define (resnet_arcface.py:162-184,
resnet_std.py:218-263) are all reachable here.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from vlsfr_tpu.models.iresnet import DEPTHS as _IR_DEPTHS
from vlsfr_tpu.models.iresnet import IResNet
from vlsfr_tpu.models.mobilefacenet import MobileFaceNet
from vlsfr_tpu.models.resnet import DEPTHS as _R_DEPTHS
from vlsfr_tpu.models.resnet import ResNet
from vlsfr_tpu.models.toynet import ToyNet

NATIVE_IMAGE_SIZE = {
    "mobile": 112,
    "toy": 32,
    **{k: 112 for k in _IR_DEPTHS},
    **{k: 224 for k in _R_DEPTHS},
}


def create_net(
    net_type: str,
    feat_dim: int = 512,
    dtype: Any = jnp.float32,
    axis_name: str | None = None,
    dropout: float = 0.0,
    bn_stats_rows: int = 0,
):
    """Build a backbone module by name; raises on unknown type
    (reference model/__init__.py:9-10)."""
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    if net_type == "toy":
        return ToyNet(feat_dim=feat_dim, dtype=dtype, axis_name=axis_name,
                      bn_stats_rows=bn_stats_rows)
    if net_type == "mobile":
        return MobileFaceNet(feat_dim=feat_dim, dtype=dtype, axis_name=axis_name,
                             bn_stats_rows=bn_stats_rows)
    if net_type in _IR_DEPTHS:
        return IResNet(
            layers=_IR_DEPTHS[net_type],
            feat_dim=feat_dim,
            dropout=dropout,
            dtype=dtype,
            axis_name=axis_name,
            bn_stats_rows=bn_stats_rows,
        )
    if net_type in _R_DEPTHS:
        block, layers = _R_DEPTHS[net_type]
        return ResNet(block=block, layers=layers, feat_dim=feat_dim, dtype=dtype,
                      axis_name=axis_name, bn_stats_rows=bn_stats_rows)
    raise ValueError(
        f"unsupported backbone {net_type!r}; choose from "
        f"{['mobile', *_IR_DEPTHS, *_R_DEPTHS]}"
    )


def native_image_size(net_type: str) -> int:
    return NATIVE_IMAGE_SIZE[net_type]
