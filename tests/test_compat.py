"""Reference-compatible FFC class API (core/compat.py)."""

import numpy as np
import pytest

from vlsfr_tpu.core.compat import FFC


@pytest.fixture(scope="module")
def net():
    return FFC("toy", feat_dim=16, queue_size=32, scale=16.0, loss_type="Arc",
               margin=0.5, momentum=0.99, neg_margin=0.25, lr=0.05)


def test_constructor_matches_reference_signature():
    # positional order of ffc.py:11-12
    n = FFC("toy", 16, 32, 16.0, "AM", 0.4, 0.99, 0.25, None, 100)
    assert n.cfg.loss.loss_type == "AM"
    assert n.cfg.pool.num_classes == 100


def test_train_step_nchw_and_nhwc(net, rng):
    b = 4
    labels = rng.integers(0, 50, size=b)
    # NCHW like the reference
    x = rng.standard_normal((b, 3, 32, 32)).astype(np.float32)
    y = rng.standard_normal((b, 3, 32, 32)).astype(np.float32)
    l1 = net.train_step(x, y, labels, labels)
    assert np.isfinite(l1)
    # NHWC also accepted; __call__ aliases
    x2 = rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
    y2 = rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
    l2 = net(x2, y2, labels, labels)
    assert np.isfinite(l2)
    assert int(net.state.step) == 2


def test_embed_and_state_dict(net, rng):
    imgs = rng.standard_normal((3, 3, 32, 32)).astype(np.float32)
    e = net.embed(imgs)
    assert e.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, rtol=1e-5)
    sd = net.state_dict()
    assert set(sd) == {"state_dict", "lru", "fc", "qp"}  # reference layout (main.py:85)
    assert sd["fc"].shape == (2, 32, 16)
    assert len(sd["qp"]) == 32
