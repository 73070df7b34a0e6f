"""End-to-end trainer tests on a synthetic store (SURVEY.md §4: the smoke
train the reference never had), including checkpoint/resume equivalence."""

import jax
import numpy as np
import pytest

from vlsfr_tpu.config import Config
from vlsfr_tpu.data.records import MultiSourceReader
from vlsfr_tpu.data.synthetic import generate_synthetic_store
from vlsfr_tpu.train.trainer import Trainer

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("trainstore")
    generate_synthetic_store(str(d), num_ids=10, images_per_id=8, image_size=32, seed=0)
    return str(d)


def tiny_cfg(store, tmp_path, head="ffc"):
    c = Config()
    c.model.net_type = "toy"
    c.model.feat_dim = 32
    c.model.dtype = "float32"
    c.data.sources = [store]
    c.data.batch_size = 8
    c.data.image_size = 32
    c.data.num_workers = 2
    c.pool.queue_size = 16
    c.pool.head = head
    c.optim.epochs = 1
    c.optim.lr = 0.01
    c.train.saved_dir = str(tmp_path / "ckpt")
    c.train.print_freq = 2
    c.train.save_freq = 5
    return c


@pytest.mark.parametrize("head", ["ffc", "full_softmax"])
def test_one_epoch_trains(store, tmp_path, head):
    cfg = tiny_cfg(store, tmp_path / head, head=head)
    t = Trainer(cfg)
    result = t.train()
    assert np.isfinite(result["loss"])
    assert result["final_step"] == t.steps_per_epoch
    t.close()


def test_resume_matches_uninterrupted(store, tmp_path):
    """Train 1 epoch straight vs train, stop, resume — same final params."""
    cfg_a = tiny_cfg(store, tmp_path / "a")
    cfg_a.optim.epochs = 2
    t_a = Trainer(cfg_a)
    t_a.train()
    params_a = np.concatenate(
        [np.ravel(x) for x in jax_leaves(t_a.state.probe_params)]
    )
    queue_a = np.asarray(t_a.state.queue)
    t_a.close()

    # interrupted run: 1 epoch, then a fresh Trainer resumes for epoch 2
    cfg_b = tiny_cfg(store, tmp_path / "b")
    cfg_b.optim.epochs = 1
    t_b1 = Trainer(cfg_b)
    t_b1.train()
    t_b1.close()
    cfg_b2 = tiny_cfg(store, tmp_path / "b")
    cfg_b2.optim.epochs = 2
    t_b2 = Trainer(cfg_b2)
    assert t_b2.start_epoch == 1
    t_b2.train()
    params_b = np.concatenate(
        [np.ravel(x) for x in jax_leaves(t_b2.state.probe_params)]
    )
    queue_b = np.asarray(t_b2.state.queue)
    t_b2.close()

    np.testing.assert_allclose(params_a, params_b, atol=1e-5)
    np.testing.assert_allclose(queue_a, queue_b, atol=1e-5)


def jax_leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_fused_update_trains_and_resumes(store, tmp_path):
    """Fused-update softmax head (bare classifier_mom opt_state layout):
    end-to-end train + checkpoint/resume equivalence vs uninterrupted."""

    def cfg_for(path, epochs):
        c = tiny_cfg(store, path, head="full_softmax")
        c.pool.num_classes = 10
        c.pool.use_fused = "on"       # streaming head at toy class count
        c.pool.fused_update = "auto"  # -> on (SGD, no clip, model axis == 1;
        # the conftest's 8 virtual devices make this a data=8 mesh, so the
        # shard_map all-gather head path is what trains here)
        c.optim.epochs = epochs
        return c

    t_a = Trainer(cfg_for(tmp_path / "a", 2))
    assert "classifier_mom" in t_a.state.opt_state  # fused layout routed
    t_a.train()
    cls_a = np.asarray(t_a.state.params["classifier"])
    mom_a = np.asarray(t_a.state.opt_state["classifier_mom"])
    t_a.close()

    t_b1 = Trainer(cfg_for(tmp_path / "b", 1))
    t_b1.train()
    t_b1.close()
    t_b2 = Trainer(cfg_for(tmp_path / "b", 2))
    assert t_b2.start_epoch == 1
    t_b2.train()
    cls_b = np.asarray(t_b2.state.params["classifier"])
    mom_b = np.asarray(t_b2.state.opt_state["classifier_mom"])
    t_b2.close()

    np.testing.assert_allclose(cls_a, cls_b, atol=1e-6)
    np.testing.assert_allclose(mom_a, mom_b, atol=1e-6)


def test_fuse_forward_mode_trains(store, tmp_path):
    cfg = tiny_cfg(store, tmp_path / "fuse")
    cfg.pool.fuse_forward = True
    t = Trainer(cfg)
    result = t.train()
    assert np.isfinite(result["loss"])
    t.close()


def test_in_training_eval(store, tmp_path):
    cfg = tiny_cfg(store, tmp_path / "ev")
    cfg.train.eval_freq = 5
    t = Trainer(cfg)
    t.train()
    ev = t.evaluate()
    assert 0.0 <= ev["verification_acc_train"] <= 1.0
    t.close()


def test_eval_use_ema_selects_gallery_net(store, tmp_path):
    """train.eval_use_ema routes in-training eval through the EMA gallery
    params (which differ from the probe after a few steps)."""
    cfg = tiny_cfg(store, tmp_path / "ev_ema")
    cfg.train.eval_use_ema = True
    t = Trainer(cfg)
    t.train()
    v = t._eval_variables()
    gal = jax.tree.leaves(t.state.gallery_params)[0]
    probe = jax.tree.leaves(t.state.probe_params)[0]
    got = jax.tree.leaves(v["params"])[0]
    assert np.allclose(np.asarray(got), np.asarray(gal))
    assert not np.allclose(np.asarray(gal), np.asarray(probe))
    ev = t.evaluate()
    assert 0.0 <= ev["verification_acc_train"] <= 1.0
    t.close()


def test_pretrained_from_previous_run(store, tmp_path):
    cfg1 = tiny_cfg(store, tmp_path / "pre1")
    t1 = Trainer(cfg1)
    t1.train()
    trained = np.concatenate([np.ravel(x) for x in jax_leaves(t1.state.probe_params)])
    t1.close()
    cfg2 = tiny_cfg(store, tmp_path / "pre2")
    cfg2.train.pretrained_model_path = str(tmp_path / "pre1" / "ckpt")
    cfg2.optim.epochs = 0  # just init
    t2 = Trainer(cfg2)
    init_params = np.concatenate([np.ravel(x) for x in jax_leaves(t2.state.probe_params)])
    gal = np.concatenate([np.ravel(x) for x in jax_leaves(t2.state.gallery_params)])
    np.testing.assert_allclose(init_params, trained, atol=1e-6)
    np.testing.assert_allclose(gal, trained, atol=1e-6)  # gallery = copy
    t2.close()


def test_softmax_sharded_streaming_head(store, tmp_path):
    """full_softmax + mesh.model=2 + forced streaming → sharded shard_map path."""
    cfg = tiny_cfg(store, tmp_path / "ss", head="full_softmax")
    cfg.mesh.model = 2
    cfg.mesh.data = 4
    cfg.pool.use_fused = "on"
    t = Trainer(cfg)
    result = t.train()
    assert np.isfinite(result["loss"])
    t.close()


def test_resume_mid_epoch(store, tmp_path):
    """Checkpoint at a non-epoch boundary resumes at the right step."""
    cfg = tiny_cfg(store, tmp_path / "mid")
    cfg.optim.epochs = 1
    cfg.train.save_freq = 3  # spe is 10 -> saves at steps 3,6,9,10(final)
    t1 = Trainer(cfg)
    spe = t1.steps_per_epoch
    t1.train()
    t1.close()
    # delete the final checkpoint so the latest is mid-epoch
    import shutil

    ck = tmp_path / "mid" / "ckpt"
    steps = sorted(int(p.name) for p in ck.iterdir() if p.name.isdigit())
    for s in steps[-1:]:
        shutil.rmtree(ck / str(s))
        host = ck / f"host_{s}.npz"
        if host.exists():
            host.unlink()
    cfg2 = tiny_cfg(store, tmp_path / "mid")
    cfg2.optim.epochs = 1
    cfg2.train.save_freq = 3
    t2 = Trainer(cfg2)
    assert t2.start_epoch == 0
    assert t2.start_step == steps[-2] % spe
    t2.close()


def test_ffc_actually_learns(tmp_path):
    """End-to-end learning signal: verification accuracy on a separable
    synthetic set must rise well above its starting point (measured
    0.65 → 0.99 at 12 epochs; thresholds kept lenient for CI noise)."""
    from vlsfr_tpu.data.synthetic import generate_synthetic_store

    d = str(tmp_path / "learnstore")
    generate_synthetic_store(d, num_ids=20, images_per_id=12, image_size=32, seed=0)
    cfg = Config()
    cfg.model.net_type = "toy"
    cfg.model.feat_dim = 32
    cfg.model.dtype = "float32"
    cfg.data.sources = [d]
    cfg.data.batch_size = 16
    cfg.data.image_size = 32
    cfg.data.num_workers = 2
    cfg.pool.queue_size = 32
    cfg.optim.epochs = 10
    cfg.optim.lr = 0.05
    cfg.optim.milestones = [8]
    cfg.optim.gammas = [0.1]
    cfg.loss.scale = 16.0
    cfg.loss.margin = 0.3
    cfg.train.saved_dir = str(tmp_path / "ckpt")
    cfg.train.print_freq = 1000
    cfg.train.save_freq = 10**9
    t = Trainer(cfg)
    acc0 = t.evaluate()["verification_acc_train"]
    t.train()
    acc1 = t.evaluate()["verification_acc_train"]
    t.close()
    assert acc1 > 0.85, f"did not learn: {acc0:.3f} -> {acc1:.3f}"
    assert acc1 > acc0 + 0.1


def test_classifier_padding_for_sharding(store, tmp_path):
    """num_classes not divisible by the model axis gets padded up."""
    cfg = tiny_cfg(store, tmp_path / "pad", head="full_softmax")
    cfg.mesh.model = 4
    cfg.mesh.data = 2
    cfg.pool.num_classes = 10  # -> 12 over 4 shards
    t = Trainer(cfg)
    assert t.cfg.pool.num_classes == 12
    assert t.state.params["classifier"].shape[0] == 12
    result = t.train()
    assert np.isfinite(result["loss"])
    t.close()


def test_ffc_trainer_with_model_sharded_queue(store, tmp_path):
    """FFC head through the Trainer with a 2-way model-sharded queue and the
    sharded streaming loss."""
    cfg = tiny_cfg(store, tmp_path / "ffcshard")
    cfg.mesh.model = 2
    cfg.mesh.data = 4
    cfg.pool.queue_size = 16
    cfg.pool.use_fused = "on"
    t = Trainer(cfg)
    result = t.train()
    assert np.isfinite(result["loss"])
    t.close()


def test_sampled_partial_fc_head(store, tmp_path):
    cfg = tiny_cfg(store, tmp_path / "samp", head="full_softmax")
    cfg.pool.sample_rate = 0.5
    t = Trainer(cfg)
    result = t.train()
    assert np.isfinite(result["loss"])
    t.close()


def test_sparse_classifier_update_matches_dense_when_all_sampled(store, tmp_path):
    """With every class sampled exactly once, the sparse row-wise SGD must
    match the dense optax trajectory exactly."""
    import jax
    import jax.numpy as jnp

    from vlsfr_tpu.models import create_net
    from vlsfr_tpu.optim import make_optimizer, make_schedule
    from vlsfr_tpu.train.softmax_head import create_softmax_state, make_softmax_train_step

    def build(sparse):
        cfg = Config()
        cfg.model.net_type = "toy"
        cfg.model.feat_dim = 16
        cfg.model.dtype = "float32"
        cfg.data.batch_size = 8
        cfg.pool.head = "full_softmax"
        cfg.pool.num_classes = 8  # == batch -> sampled set = labels only
        cfg.pool.sample_rate = 1e-9  # num_sampled = max(batch, ~0) = 8
        cfg.pool.sparse_update = sparse
        cfg.optim.lr = 0.05
        model = create_net("toy", feat_dim=16)
        opt = make_optimizer(cfg.optim)
        sched = make_schedule(cfg.optim, steps_per_epoch=10)
        state = create_softmax_state(jax.random.PRNGKey(0), model, cfg, opt, 32, 8)
        step = make_softmax_train_step(model, cfg, opt, sched)
        return state, step

    rng_ = np.random.default_rng(3)
    images = rng_.standard_normal((8, 32, 32, 3)).astype(np.float32)
    labels = rng_.permutation(8).astype(np.int32)  # every class exactly once

    s_sparse, step_sparse = build(True)
    s_dense, step_dense = build(False)
    for _ in range(3):
        s_sparse, m1 = step_sparse(s_sparse, jnp.asarray(images), jnp.asarray(labels), 1.0)
        s_dense, m2 = step_dense(s_dense, jnp.asarray(images), jnp.asarray(labels), 1.0)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_sparse.params["classifier"]),
        np.asarray(s_dense.params["classifier"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_sparse.params["backbone"])[0]),
        np.asarray(jax.tree.leaves(s_dense.params["backbone"])[0]),
        atol=1e-5,
    )


def test_sparse_sampled_trainer_smoke(store, tmp_path):
    cfg = tiny_cfg(store, tmp_path / "sparse", head="full_softmax")
    cfg.pool.sample_rate = 0.5
    cfg.pool.sparse_update = True
    t = Trainer(cfg)
    result = t.train()
    assert np.isfinite(result["loss"])
    t.close()


def test_int8_queue_resume_matches_uninterrupted(store, tmp_path):
    """queue_dtype=int8 checkpoint schema (FFCState.queue_scales): train 2
    epochs straight vs train-stop-resume — identical final params, int8
    queue rows, AND per-row dequant scales (the round-3 schema addition)."""

    def cfg_for(path, epochs):
        c = tiny_cfg(store, path)
        c.pool.queue_dtype = "int8"
        c.pool.use_fused = "on"  # int8 storage requires the streaming head
        c.optim.epochs = epochs
        return c

    t_a = Trainer(cfg_for(tmp_path / "a", 2))
    assert t_a.state.queue.dtype == np.int8
    assert t_a.state.queue_scales is not None
    t_a.train()
    params_a = np.concatenate(
        [np.ravel(x) for x in jax_leaves(t_a.state.probe_params)])
    queue_a = np.asarray(t_a.state.queue)
    scales_a = np.asarray(t_a.state.queue_scales)
    t_a.close()

    t_b1 = Trainer(cfg_for(tmp_path / "b", 1))
    t_b1.train()
    t_b1.close()
    t_b2 = Trainer(cfg_for(tmp_path / "b", 2))
    assert t_b2.start_epoch == 1
    # the restored device state round-trips the int8 rows + scales exactly
    assert t_b2.state.queue.dtype == np.int8
    t_b2.train()
    params_b = np.concatenate(
        [np.ravel(x) for x in jax_leaves(t_b2.state.probe_params)])
    queue_b = np.asarray(t_b2.state.queue)
    scales_b = np.asarray(t_b2.state.queue_scales)
    t_b2.close()

    np.testing.assert_allclose(params_a, params_b, atol=1e-5)
    np.testing.assert_array_equal(queue_a, queue_b)  # int8: bit-exact
    np.testing.assert_allclose(scales_a, scales_b, rtol=0, atol=0)
