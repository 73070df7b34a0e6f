"""PyTorch-checkpoint → flax-variables converter.

The fidelity gate (BASELINE.md) requires embedding cosine agreement ≥0.999
against the PyTorch reference. This module imports reference checkpoints
(``torch.save({'state_dict': probe_net.state_dict(), ...})``, reference
main.py:84-85) — or any state_dict of the reference architectures — into the
flax variable trees of vlsfr_tpu.models.

Layout conversions applied:

* conv weight  [O, I/g, kH, kW]  →  kernel [kH, kW, I/g, O]
* linear       [O, I]            →  kernel [I, O]
* the flatten-feeding fc additionally permutes its input rows from torch's
  NCHW flatten order (c·H·W + h·W + w) to our NHWC order (h·W·C + w·C + c)
* BN weight/bias/running_mean/running_var → scale/bias (params) +
  mean/var (batch_stats); num_batches_tracked is dropped
* PReLU weight [C] → alpha

All values are numpy in/out; torch is only needed by :func:`load_torch_checkpoint`.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np
from flax import traverse_util

from vlsfr_tpu.models import create_net


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _fc_kernel_with_nhwc_permutation(w: np.ndarray, spatial: int) -> np.ndarray:
    """[O, C*H*W] torch fc weight -> [H*W*C, O] flax kernel."""
    o, i = w.shape
    hw = spatial * spatial
    c = i // hw
    assert c * hw == i, f"fc in_features {i} not divisible by {hw}"
    w = w.reshape(o, c, spatial, spatial).transpose(0, 2, 3, 1).reshape(o, i)
    return np.ascontiguousarray(w.T)


class _TreeBuilder:
    def __init__(self):
        self.params: dict[tuple, np.ndarray] = {}
        self.stats: dict[tuple, np.ndarray] = {}

    def conv(self, sd, tkey: str, fpath: tuple):
        self.params[(*fpath, "conv", "kernel")] = _conv_kernel(np.asarray(sd[f"{tkey}.weight"]))

    def bn(self, sd, tkey: str, fpath: tuple, has_scale: bool = True):
        if has_scale:
            self.params[(*fpath, "bn", "scale")] = np.asarray(sd[f"{tkey}.weight"])
        self.params[(*fpath, "bn", "bias")] = np.asarray(sd[f"{tkey}.bias"])
        self.stats[(*fpath, "bn", "mean")] = np.asarray(sd[f"{tkey}.running_mean"])
        self.stats[(*fpath, "bn", "var")] = np.asarray(sd[f"{tkey}.running_var"])

    def prelu(self, sd, tkey: str, fpath: tuple):
        self.params[(*fpath, "alpha")] = np.asarray(sd[f"{tkey}.weight"])

    def fc(self, sd, tkey: str, fpath: tuple, spatial: int):
        self.params[(*fpath, "kernel")] = _fc_kernel_with_nhwc_permutation(
            np.asarray(sd[f"{tkey}.weight"]), spatial
        )
        self.params[(*fpath, "bias")] = np.asarray(sd[f"{tkey}.bias"])

    def conv_block(self, sd, tkey: str, fpath: tuple, linear: bool = False):
        """Reference mobilefacenet ConvBlock: conv+bn(+prelu)."""
        self.conv(sd, f"{tkey}.conv", (*fpath, "conv"))
        self.bn(sd, f"{tkey}.bn", (*fpath, "bn"))
        if not linear:
            self.prelu(sd, f"{tkey}.prelu", (*fpath, "prelu"))


def _convert_mobilefacenet(sd: Mapping[str, np.ndarray]) -> _TreeBuilder:
    t = _TreeBuilder()
    t.conv_block(sd, "conv1", ("conv1",))
    t.conv_block(sd, "dw_conv1", ("dw_conv1",))
    n_blocks = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    # torch Bottleneck.conv Sequential indices -> our named submodules
    seq_map = {
        "0": ("expand", "conv"),
        "1": ("expand", "bn"),
        "2": ("expand", "prelu"),
        "3": ("depthwise", "conv"),
        "4": ("depthwise", "bn"),
        "5": ("depthwise", "prelu"),
        "6": ("project", "conv"),
        "7": ("project", "bn"),
    }
    for i in range(n_blocks):
        for idx, (sub, kind) in seq_map.items():
            tkey = f"blocks.{i}.conv.{idx}"
            fpath = (f"blocks_{i}", sub, kind)
            if kind == "conv":
                t.conv(sd, tkey, fpath)
            elif kind == "bn":
                t.bn(sd, tkey, fpath)
            else:
                t.prelu(sd, tkey, fpath)
    t.conv_block(sd, "conv2", ("conv2",))
    t.conv_block(sd, "linear7", ("linear7",), linear=True)
    t.conv_block(sd, "linear1", ("linear1",), linear=True)
    return t


def _convert_iresnet(sd: Mapping[str, np.ndarray]) -> _TreeBuilder:
    t = _TreeBuilder()
    t.conv(sd, "conv1", ("conv1",))
    t.bn(sd, "bn1", ("bn1",))
    t.prelu(sd, "prelu", ("prelu",))
    for s in range(1, 5):
        i = 0
        while f"layer{s}.{i}.conv1.weight" in sd:
            tb, fb = f"layer{s}.{i}", f"layer{s}_{i}"
            t.bn(sd, f"{tb}.bn1", (fb, "bn1"))
            t.conv(sd, f"{tb}.conv1", (fb, "conv1"))
            t.bn(sd, f"{tb}.bn2", (fb, "bn2"))
            t.prelu(sd, f"{tb}.prelu", (fb, "prelu"))
            t.conv(sd, f"{tb}.conv2", (fb, "conv2"))
            t.bn(sd, f"{tb}.bn3", (fb, "bn3"))
            if f"{tb}.downsample.0.weight" in sd:
                t.conv(sd, f"{tb}.downsample.0", (fb, "downsample_conv"))
                t.bn(sd, f"{tb}.downsample.1", (fb, "downsample_bn"))
            i += 1
    t.bn(sd, "bn2", ("bn2",))
    t.fc(sd, "fc", ("fc",), spatial=7)
    # 'features' BN1d has its scale frozen at 1.0 (resnet_arcface.py:96-98);
    # our module uses use_scale=False, so the (all-ones) weight is dropped.
    t.bn(sd, "features", ("features",), has_scale=False)
    return t


def _convert_resnet(sd: Mapping[str, np.ndarray]) -> _TreeBuilder:
    t = _TreeBuilder()
    t.conv(sd, "conv1", ("conv1",))
    t.bn(sd, "bn1", ("bn1",))
    bottleneck = "layer1.0.conv3.weight" in sd
    n_convs = 3 if bottleneck else 2
    for s in range(1, 5):
        i = 0
        while f"layer{s}.{i}.conv1.weight" in sd:
            tb, fb = f"layer{s}.{i}", f"layer{s}_{i}"
            for c in range(1, n_convs + 1):
                t.conv(sd, f"{tb}.conv{c}", (fb, f"conv{c}"))
                t.bn(sd, f"{tb}.bn{c}", (fb, f"bn{c}"))
            if f"{tb}.downsample.0.weight" in sd:
                t.conv(sd, f"{tb}.downsample.0", (fb, "downsample_conv"))
                t.bn(sd, f"{tb}.downsample.1", (fb, "downsample_bn"))
            i += 1
    t.fc(sd, "fc", ("fc",), spatial=7)
    t.bn(sd, "features", ("features",))
    return t


def convert_torch_state_dict(
    state_dict: Mapping[str, np.ndarray], net_type: str, feat_dim: int = 512
) -> dict:
    """Convert a reference-architecture torch state_dict (numpy values) into
    flax variables ``{"params": ..., "batch_stats": ...}`` for
    ``create_net(net_type, feat_dim)``. Validates structure + shapes against
    the flax model's own initialization.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items() if "num_batches_tracked" not in k}
    if net_type == "mobile":
        t = _convert_mobilefacenet(sd)
    elif net_type.startswith("ir"):
        t = _convert_iresnet(sd)
    elif net_type.startswith("r"):
        t = _convert_resnet(sd)
    else:
        raise ValueError(f"unknown net_type {net_type!r}")

    variables = {
        "params": traverse_util.unflatten_dict(t.params),
        "batch_stats": traverse_util.unflatten_dict(t.stats),
    }
    _validate_against_model(variables, net_type, feat_dim)
    return variables


def _validate_against_model(variables: dict, net_type: str, feat_dim: int) -> None:
    import jax
    import jax.numpy as jnp

    from vlsfr_tpu.models import native_image_size

    model = create_net(net_type, feat_dim=feat_dim)
    size = native_image_size(net_type)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False)
    )
    want = {k: v.shape for k, v in traverse_util.flatten_dict(ref).items()}
    got = {k: np.shape(v) for k, v in traverse_util.flatten_dict(variables).items()}
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    if missing or extra:
        raise ValueError(
            f"converted tree mismatch for {net_type}: missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]}"
        )
    for k in want:
        if want[k] != got[k]:
            raise ValueError(f"shape mismatch at {k}: torch {got[k]} vs flax {want[k]}")


def load_torch_checkpoint(path: str, net_type: str, feat_dim: int = 512) -> dict:
    """Load a reference ``*.pt`` checkpoint (or bare state_dict) from disk."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    sd = {k: v.detach().cpu().numpy() for k, v in obj.items()}
    return convert_torch_state_dict(sd, net_type, feat_dim)
