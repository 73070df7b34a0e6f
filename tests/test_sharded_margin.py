"""Sharded+streaming margin-softmax: loss and gradient parity with the
unsharded paths on the 8-device virtual CPU mesh (BASELINE config 5 logic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vlsfr_tpu.ops.margin import add_margin
from vlsfr_tpu.parallel.mesh import make_mesh
from vlsfr_tpu.parallel.sharded_margin import make_sharded_streaming_loss


def make_case(rng, b=8, c=128, d=16, frac_outlier=0.3):
    emb = rng.standard_normal((b, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    w = rng.standard_normal((c, d)).astype(np.float32)
    labels = rng.integers(0, c, size=b).astype(np.int32)
    labels[rng.random(b) < frac_outlier] = -1
    return emb, w, labels


def dense_ref(emb, w, labels, loss_type, k):
    wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    return add_margin(emb @ wn.T, labels, loss_type=loss_type, margin=0.5,
                      scale=24.0, hard_neg=k)


def place(mesh, emb, w, labels):
    e = jax.device_put(emb, NamedSharding(mesh, P("data", None)))
    ww = jax.device_put(w, NamedSharding(mesh, P("model", None)))
    l = jax.device_put(labels, NamedSharding(mesh, P("data")))
    return e, ww, l


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_sharded_loss_matches_dense(loss_type, rng):
    mesh = make_mesh(2, 4)
    emb, w, labels = make_case(rng)
    want = float(dense_ref(emb, w, labels, loss_type, 5))
    loss_fn = make_sharded_streaming_loss(
        mesh, loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=5, tile=16
    )
    e, ww, l = place(mesh, emb, w, labels)
    got, _ = jax.jit(loss_fn)(e, ww, l)
    assert float(got) == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_sharded_grads_match_dense(loss_type, rng):
    mesh = make_mesh(2, 4)
    emb, w, labels = make_case(rng, b=8, c=64, d=8)
    loss_fn = make_sharded_streaming_loss(
        mesh, loss_type=loss_type, margin=0.5, scale=24.0, hard_neg=3, tile=8
    )
    e, ww, l = place(mesh, emb, w, labels)
    ge_s, gw_s = jax.jit(jax.grad(lambda a, b_: loss_fn(a, b_, l)[0], argnums=(0, 1)))(e, ww)
    ge_d, gw_d = jax.grad(
        lambda a, b_: dense_ref(a, b_, labels, loss_type, 3), argnums=(0, 1)
    )(jnp.asarray(emb), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(ge_s), np.asarray(ge_d), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_d), atol=3e-5)


def test_classifier_grads_stay_sharded(rng):
    mesh = make_mesh(2, 4)
    emb, w, labels = make_case(rng, b=8, c=64, d=8, frac_outlier=0.0)
    loss_fn = make_sharded_streaming_loss(mesh, hard_neg=3, tile=8)
    e, ww, l = place(mesh, emb, w, labels)
    gw = jax.jit(jax.grad(lambda b_: loss_fn(e, b_, l)[0]))(ww)
    assert gw.sharding.spec == P("model", None)


def test_model_axis_one_degenerates(rng):
    """mesh.model == 1 must equal the plain streaming op."""
    mesh = make_mesh(8, 1)
    emb, w, labels = make_case(rng, b=8, c=48, d=8)
    loss_fn = make_sharded_streaming_loss(mesh, margin=0.5, scale=24.0, hard_neg=3, tile=8)
    e, ww, l = place(mesh, emb, w, labels)
    got, _ = jax.jit(loss_fn)(e, ww, l)
    want = float(dense_ref(emb, w, labels, "Arc", 3))
    assert float(got) == pytest.approx(want, rel=1e-4)
