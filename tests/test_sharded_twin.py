"""Sharded twin-view FFC head (parallel/sharded_twin.py): loss and gradient
parity with the single-shard twin op on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vlsfr_tpu.ops.twin_margin import twin_add_margin
from vlsfr_tpu.parallel.mesh import make_mesh
from vlsfr_tpu.parallel.sharded_twin import make_sharded_twin_loss


def make_case(rng, b=8, q=128, d=16, frac_outlier=0.25, dup_col=True):
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    emb = unit(rng.standard_normal((b, d)).astype(np.float32))
    q0 = unit(rng.standard_normal((q, d)).astype(np.float32))
    q1 = unit(rng.standard_normal((q, d)).astype(np.float32))
    g = unit(rng.standard_normal((b, d)).astype(np.float32))
    rows = rng.integers(0, 2, size=b).astype(np.int32)
    cols = rng.integers(0, q, size=b).astype(np.int32)
    if dup_col and b >= 4:
        cols[1] = cols[0]  # duplicate slot: last-write-wins must hold
        rows[1] = rows[0]
    seen = (rng.random(b) < 0.7).astype(np.float32)
    labels = rng.integers(0, q, size=b).astype(np.int32)
    labels[rng.random(b) < frac_outlier] = -1
    # make one label hit a written slot so the blend path matters
    labels[0] = cols[-1]
    return emb, q0, q1, g, rows, cols, seen, labels


def place(mesh, emb, q0, q1, g, rows, cols, seen, labels):
    dat = lambda a: jax.device_put(a, NamedSharding(mesh, P("data", *[None] * (a.ndim - 1))))  # noqa: E731
    rep = lambda a: jax.device_put(a, NamedSharding(mesh, P(*[None] * a.ndim)))  # noqa: E731
    queue = jax.device_put(np.stack([q0, q1]), NamedSharding(mesh, P(None, "model", None)))
    return (dat(emb), queue, rep(g), rep(rows), rep(cols),
            rep(seen), dat(labels))


def ref_loss(emb, q0, q1, g, rows, cols, seen, labels, loss_type, k):
    queue = jnp.stack([jnp.asarray(q0), jnp.asarray(q1)])
    return twin_add_margin(
        jnp.asarray(emb), queue, jnp.asarray(g),
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(seen),
        jnp.asarray(labels), loss_type=loss_type, margin=0.5, scale=24.0,
        hard_neg=k, tile=16, use_pallas=False)


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_sharded_twin_loss_matches_single(loss_type, rng):
    mesh = make_mesh(2, 4)
    case = make_case(rng)
    want = float(ref_loss(*case, loss_type, 5))
    loss_fn = make_sharded_twin_loss(mesh, loss_type=loss_type, margin=0.5,
                                     scale=24.0, hard_neg=5, tile=16)
    got = jax.jit(loss_fn)(*place(mesh, *case))
    assert float(got) == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("loss_type", ["Arc", "AM", "SV"])
def test_sharded_twin_demb_matches_single(loss_type, rng):
    mesh = make_mesh(2, 4)
    case = make_case(rng)
    emb = case[0]
    rest = case[1:]
    ge_ref = jax.grad(
        lambda e: ref_loss(e, *rest, loss_type, 3)
    )(jnp.asarray(emb))
    loss_fn = make_sharded_twin_loss(mesh, loss_type=loss_type, margin=0.5,
                                     scale=24.0, hard_neg=3, tile=16)
    placed = place(mesh, *case)
    ge_s = jax.jit(jax.grad(lambda e: loss_fn(e, *placed[1:])))(placed[0])
    np.testing.assert_allclose(np.asarray(ge_s), np.asarray(ge_ref), atol=3e-5)


def test_all_outliers_and_no_outliers(rng):
    mesh = make_mesh(2, 4)
    for frac in (0.0, 1.0):
        case = make_case(rng, frac_outlier=frac, dup_col=False)
        if frac == 1.0:
            # force every label negative (make_case pins labels[0] to a slot)
            emb, q0, q1, g, rows, cols, seen, labels = case
            labels = np.full_like(labels, -1)
            case = (emb, q0, q1, g, rows, cols, seen, labels)
        want = float(ref_loss(*case, "Arc", 4))
        loss_fn = make_sharded_twin_loss(mesh, hard_neg=4, scale=24.0,
                                         margin=0.5, tile=16)
        got = jax.jit(loss_fn)(*place(mesh, *case))
        assert float(got) == pytest.approx(want, rel=1e-4), f"frac={frac}"


def test_ffc_loss_fn_routes_sharded_twin(rng):
    """make_ffc_loss_fn with a model>1 mesh + fused: the sharded twin path
    produces the same loss as the single-shard fused path."""
    from vlsfr_tpu.config import Config
    from vlsfr_tpu.core.dcp import DCPManager
    from vlsfr_tpu.core.ffc import FFCState, init_queue, make_ffc_loss_fn
    from tests.test_ffc_step import TinyEmbed

    cfg = Config()
    cfg.pool.queue_size = 64
    cfg.model.feat_dim = 8
    cfg.loss.loss_type = "Arc"
    cfg.loss.scale = 16.0
    cfg.pool.use_fused = "on"
    model = TinyEmbed(feat_dim=8)
    wp = rng.standard_normal((12, 8)).astype(np.float32) * 0.3
    wg = rng.standard_normal((12, 8)).astype(np.float32) * 0.3
    state = FFCState(
        step=jnp.zeros((), jnp.int32),
        probe_params={"fc": {"kernel": jnp.asarray(wp)}},
        probe_stats={},
        gallery_params={"fc": {"kernel": jnp.asarray(wg)}},
        gallery_stats={},
        queue=jnp.asarray(init_queue(jax.random.PRNGKey(1), 64, 8)[0]),
        opt_state=None,
    )
    mgr = DCPManager(64)
    b = 8
    labels = rng.integers(0, 30, size=b)
    idx = mgr.plan_step(labels, labels)
    x = rng.standard_normal((b, 12)).astype(np.float32)
    y = rng.standard_normal((b, 12)).astype(np.float32)

    loss_single, (plan_s, *_rest) = make_ffc_loss_fn(model, cfg)(
        state.probe_params, state, jnp.asarray(x), jnp.asarray(y), idx)

    mesh = make_mesh(2, 4)
    loss_fn_mesh = make_ffc_loss_fn(model, cfg, mesh=mesh)
    loss_mesh, (plan_m, *_rest2) = loss_fn_mesh(
        state.probe_params, state, jnp.asarray(x), jnp.asarray(y), idx)
    assert float(loss_mesh) == pytest.approx(float(loss_single), rel=1e-4)
    # both fused paths defer the persistence scatter (write plan, not queue)
    assert isinstance(plan_s, tuple) and isinstance(plan_m, tuple)
