"""Int8 gallery-forward path (ops/quant.py): quantizer math, interceptor
transparency (identical param trees, depthwise fall-through), embedding
fidelity, and the FFC gallery_int8 wiring. Real-chip throughput lives in
tools/bench_int8.py → docs/PERF.md."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vlsfr_tpu.models.layers import BatchNorm, Conv, PReLU
from vlsfr_tpu.ops.quant import (
    int8_conv_inference,
    quantize_act_per_tensor,
    quantize_weight_per_channel,
)


class SmallConvNet(nn.Module):
    """Conv stack shaped like the backbones: ungrouped convs (int8
    candidates), a depthwise conv (must fall through), BN+PReLU between."""

    feat_dim: int = 24

    @nn.compact
    def __call__(self, x, train=True):
        x = Conv(16, 3, 2, 1, name="c1")(x)
        x = BatchNorm(name="bn1")(x, train)
        x = PReLU(16, name="pr1")(x)
        x = Conv(16, 3, 1, 1, groups=16, name="dw")(x)  # depthwise
        x = BatchNorm(name="bn2")(x, train)
        x = Conv(self.feat_dim, 1, 1, 0, name="pw")(x)
        return jnp.mean(x, axis=(1, 2))


def _init(rng):
    net = SmallConvNet()
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    return net, x, variables


def test_weight_quant_per_channel_bounds(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32))
    wq, scale = quantize_weight_per_channel(w)
    assert wq.dtype == jnp.int8 and scale.shape == (16,)
    # reconstruction error bounded by half a quantization step per channel
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(scale) - np.asarray(w))
    assert (err <= 0.5 * np.asarray(scale) + 1e-7).all()
    # scale hits the per-channel absmax exactly at 127
    np.testing.assert_allclose(np.asarray(scale) * 127.0,
                               np.abs(np.asarray(w)).max(axis=(0, 1, 2)),
                               rtol=1e-6)


def test_act_quant_per_tensor(rng):
    x = jnp.asarray(rng.standard_normal((5, 7)).astype(np.float32) * 3.0)
    xq, s = quantize_act_per_tensor(x)
    assert xq.dtype == jnp.int8 and np.ndim(s) == 0
    err = np.abs(np.asarray(xq, np.float32) * float(s) - np.asarray(x))
    assert (err <= 0.5 * float(s) + 1e-7).all()


def test_param_tree_identical_and_output_close(rng):
    net, x, variables = _init(rng)
    y0, mut0 = net.apply(variables, x, train=True, mutable=["batch_stats"])
    with int8_conv_inference():
        y1, mut1 = net.apply(variables, x, train=True, mutable=["batch_stats"])
        v2 = net.init(jax.random.PRNGKey(0), x)
    # interceptor must not change the variable tree (checkpoint compat)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # batch_stats still update, embeddings stay close (int8 fidelity)
    assert (jax.tree_util.tree_structure(mut0)
            == jax.tree_util.tree_structure(mut1))
    a = np.asarray(y0, np.float32)
    b = np.asarray(y1, np.float32)
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12)
    assert cos.min() > 0.995, cos
    assert not np.array_equal(a, b)  # it actually quantized


def test_depthwise_falls_through(rng):
    """A grouped conv alone is ineligible: int8 context output is
    bit-identical to the normal path."""

    class DWOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv(8, 3, 1, 1, groups=8, name="dw")(x)

    net = DWOnly()
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    v = net.init(jax.random.PRNGKey(1), x)
    y0 = net.apply(v, x)
    with int8_conv_inference():
        y1 = net.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_embedder_int8_serving(rng):
    """eval/extract.Embedder(int8=True): same output shape, embeddings
    within the fidelity band of the fp path."""
    from vlsfr_tpu.eval.extract import Embedder

    net, x, variables = _init(rng)
    imgs = np.asarray(x)
    e_fp = Embedder(net, variables, batch_size=3, flip_average=False)(imgs)
    e_q = Embedder(net, variables, batch_size=3, flip_average=False,
                   int8=True)(imgs)
    assert e_fp.shape == e_q.shape
    cos = np.sum(e_fp * e_q, -1) / (
        np.linalg.norm(e_fp, axis=-1) * np.linalg.norm(e_q, axis=-1) + 1e-12)
    assert cos.min() > 0.995
    assert not np.array_equal(e_fp, e_q)


def test_int8_export_roundtrip(rng):
    """The int8 path survives jax.export serialize/deserialize (the
    tools/export.py --int8 artifact): the deserialized graph carries the
    baked int8 convs and reproduces the live int8 output."""
    from jax import export as jexport

    net, x, variables = _init(rng)

    def forward(images):
        with int8_conv_inference():
            return net.apply(variables, images, train=False)

    exported = jexport.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(x.shape, jnp.float32))
    blob = exported.serialize()
    reloaded = jexport.deserialize(blob)
    y_rt = np.asarray(reloaded.call(x))
    y_live = np.asarray(forward(x))
    np.testing.assert_allclose(y_rt, y_live, atol=1e-5)


def test_ffc_gallery_int8_wiring(rng):
    """make_ffc_loss_fn with pool.gallery_int8: loss finite, differs from
    the fp path only through the gallery embeddings."""
    from vlsfr_tpu.config import Config
    from vlsfr_tpu.core.dcp import DCPManager
    from vlsfr_tpu.core.ffc import FFCState, init_queue, make_ffc_loss_fn

    class ImgEmbed(nn.Module):
        feat_dim: int = 16

        @nn.compact
        def __call__(self, x, train=True):
            x = Conv(8, 3, 2, 1, name="c1")(x)
            x = BatchNorm(name="bn")(x, train)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.feat_dim, name="fc")(x)

    cfg = Config()
    cfg.pool.queue_size = 64
    cfg.model.feat_dim = 16
    b = 8
    model = ImgEmbed()
    x = jnp.asarray(rng.standard_normal((b, 12, 12, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, 12, 12, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    mgr = DCPManager(cfg.pool.queue_size)
    labels = rng.integers(0, 20, size=b)
    idx = mgr.plan_step(labels, labels)

    def run(gallery_int8):
        c = Config()
        c.pool.queue_size = cfg.pool.queue_size
        c.model.feat_dim = cfg.model.feat_dim
        c.pool.gallery_int8 = gallery_int8
        loss_fn = make_ffc_loss_fn(model, c)
        state = FFCState(
            step=jnp.zeros((), jnp.int32),
            probe_params=variables["params"],
            probe_stats=variables.get("batch_stats", {}),
            gallery_params=jax.tree.map(jnp.copy, variables["params"]),
            gallery_stats=jax.tree.map(
                jnp.copy, variables.get("batch_stats", {})),
            queue=init_queue(jax.random.PRNGKey(3), cfg.pool.queue_size,
                             cfg.model.feat_dim)[0],
            opt_state=None,
        )
        loss, _ = jax.jit(loss_fn)(state.probe_params, state, x, y, idx)
        return float(loss)

    l_fp = run(False)
    l_q = run(True)
    assert np.isfinite(l_fp) and np.isfinite(l_q)
    assert l_fp != l_q  # the int8 gallery actually engaged
    assert abs(l_q - l_fp) / abs(l_fp) < 0.05  # and stayed close
