"""Backbone tests: shapes, normalization, bf16, and numerical parity against
the PyTorch reference architectures (the BASELINE.md ≥0.999-cosine gate).

The parity tests import the reference's own model files from /root/reference
(read-only) to produce ground-truth outputs — nothing is copied; the torch
models serve purely as oracles.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsfr_tpu.models import create_net, native_image_size
from vlsfr_tpu.models.torch_import import convert_torch_state_dict

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "model"))


def _load_ref_module(fname):
    spec = importlib.util.spec_from_file_location(
        f"ref_{fname[:-3]}", os.path.join(REF, "model", fname)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def init_and_apply(net_type, feat_dim, batch=2, dtype=jnp.float32, train=False):
    model = create_net(net_type, feat_dim=feat_dim, dtype=dtype)
    size = native_image_size(net_type)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    if train:
        out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, train=False)
    return out, variables


@pytest.mark.parametrize("net_type,feat_dim", [("mobile", 128), ("ir18", 512), ("r18", 512)])
def test_output_shape_and_norm(net_type, feat_dim):
    out, _ = init_and_apply(net_type, feat_dim)
    assert out.shape == (2, feat_dim)
    assert out.dtype == jnp.float32
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


@pytest.mark.parametrize("net_type", ["mobile", "ir18"])
def test_train_mode_updates_batch_stats(net_type):
    model = create_net(net_type, feat_dim=128)
    size = native_image_size(net_type)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed, "train=True must update BN running stats"


def test_bf16_close_to_fp32():
    out32, variables = init_and_apply("mobile", 128)
    model16 = create_net("mobile", feat_dim=128, dtype=jnp.bfloat16)
    size = native_image_size("mobile")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, size, size, 3), jnp.float32)
    out16 = model16.apply(variables, x, train=False)
    assert out16.dtype == jnp.float32  # head is fp32
    cos = np.sum(np.asarray(out32) * np.asarray(out16), axis=-1)
    assert np.all(cos > 0.98), f"bf16 drifted: cos={cos}"


def _torch_parity(net_type, feat_dim, torch_model, atol=5e-3):
    import torch

    # Calibrate BN running stats with one train-mode pass (momentum=1 makes
    # running stats == batch stats) — a randomly-initialized deep net with
    # default stats (mean 0, var 1) explodes in eval mode, which would make
    # the comparison vacuous (both sides inf/NaN).
    size = native_image_size(net_type)
    for m in torch_model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.momentum = 1.0
    torch_model.train()
    with torch.no_grad():
        torch_model(torch.randn(4, 3, size, size))
    torch_model.eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = convert_torch_state_dict(sd, net_type, feat_dim)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x)).numpy()
    model = create_net(net_type, feat_dim=feat_dim)
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    cos = np.sum(want * got, axis=-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert np.all(cos > 0.999), f"cosine parity failed: {cos}"
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_parity_mobilefacenet():
    mod = _load_ref_module("mobilefacenet_def.py")
    _torch_parity("mobile", 128, mod.MobileFaceNet(feat_dim=128, fp16=False))


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_parity_iresnet18():
    mod = _load_ref_module("resnet_arcface.py")
    _torch_parity("ir18", 512, mod.iresnet18(feat_dim=512))


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_parity_iresnet50():
    mod = _load_ref_module("resnet_arcface.py")
    _torch_parity("ir50", 512, mod.iresnet50(feat_dim=512))


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_parity_resnet18_std():
    mod = _load_ref_module("resnet_std.py")
    _torch_parity("r18", 512, mod.resnet18(feat_dim=512))


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_parity_resnet50_std():
    mod = _load_ref_module("resnet_std.py")
    _torch_parity("r50", 512, mod.resnet50(feat_dim=512))


def test_unknown_net_type_raises():
    with pytest.raises(ValueError):
        create_net("vgg16")


# ----------------------------------------------------------------------
# subset-statistics BatchNorm (perf flag, models/layers.py _SubsetBN)
# ----------------------------------------------------------------------


def test_subset_bn_full_rows_matches_flax():
    """stats_rows >= batch ⇒ bit-level same math as flax nn.BatchNorm
    (same mean/var, same EMA update, same variable layout)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlsfr_tpu.models.layers import BatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 6, 6, 16)).astype(np.float32))
    ref = BatchNorm(dtype=jnp.float32)
    sub = BatchNorm(dtype=jnp.float32, bn_stats_rows=8)
    v_ref = ref.init(jax.random.PRNGKey(0), x, train=False)
    v_sub = sub.init(jax.random.PRNGKey(0), x, train=False)
    # identical variable tree (checkpoint/torch-import compatibility)
    assert jax.tree.structure(v_ref) == jax.tree.structure(v_sub)
    y_ref, m_ref = ref.apply(v_ref, x, train=True, mutable=["batch_stats"])
    y_sub, m_sub = sub.apply(v_sub, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_ref), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m_sub["batch_stats"]["bn"][k]),
            np.asarray(m_ref["batch_stats"]["bn"][k]), atol=1e-6,
        )
    # eval path: running stats
    ye_ref = ref.apply(v_ref, x, train=False)
    ye_sub = sub.apply(v_sub, x, train=False)
    np.testing.assert_allclose(np.asarray(ye_sub), np.asarray(ye_ref), atol=1e-5)


def test_subset_bn_subset_stats_close():
    """stats from 4 of 32 rows: normalized output close to full-batch BN
    (spatial positions keep per-channel sample count high)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlsfr_tpu.models.layers import BatchNorm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 14, 14, 8)).astype(np.float32))
    full = BatchNorm(dtype=jnp.float32)
    sub = BatchNorm(dtype=jnp.float32, bn_stats_rows=4)
    v = full.init(jax.random.PRNGKey(0), x, train=False)
    y_full, _ = full.apply(v, x, train=True, mutable=["batch_stats"])
    y_sub, _ = sub.apply(v, x, train=True, mutable=["batch_stats"])
    # 4 rows × 196 positions = 784 samples/channel: stats within a few %
    err = float(jnp.abs(y_sub - y_full).max())
    assert err < 0.25, err
    corr = float(jnp.mean(y_sub * y_full) / jnp.sqrt(jnp.mean(y_sub**2) * jnp.mean(y_full**2)))
    assert corr > 0.995, corr


def test_backbone_with_bn_subsample_trains_and_evals():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlsfr_tpu.models import create_net

    m = create_net("toy", feat_dim=16, bn_stats_rows=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 32, 32, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (8, 16)
    assert np.isfinite(np.asarray(out)).all()
    # eval consumes the updated running stats
    out_e = m.apply({"params": v["params"], "batch_stats": mut["batch_stats"]}, x, train=False)
    assert np.isfinite(np.asarray(out_e)).all()
