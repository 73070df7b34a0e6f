"""Cross-stack .bin verification (tools/cross_stack_eval.py, round-2
verdict item 4): a verification file packed with the insightface lfw2pack
conventions (NOT this repo's writer) must be read by load_insightface_bin
and produce IDENTICAL verification metrics through the reference's torch
MobileFaceNet pipeline and this repo's flax pipeline carrying the same
ported weights."""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def case(tmp_path_factory):
    from cross_stack_eval import build_pair_bin, make_reference_mobile

    from vlsfr_tpu.data.synthetic import generate_synthetic_store

    tmp = tmp_path_factory.mktemp("xstack")
    store = str(tmp / "store")
    generate_synthetic_store(store, num_ids=24, images_per_id=4,
                             image_size=112, hard=True)
    bin_path = str(tmp / "pairs.bin")
    issame = build_pair_bin(store, bin_path, 40)
    tm = make_reference_mobile(112)
    return bin_path, issame, tm


def test_build_pair_bin_start_restricts_to_tail(case, tmp_path):
    """start= (the holdout-tail mode tools/casia_scale_study.py uses) must
    sample ONLY record indices >= start."""
    from cross_stack_eval import build_pair_bin

    from vlsfr_tpu.data.records import FaceRecordReader

    bin_path, _, _ = case
    store = os.path.join(os.path.dirname(bin_path), "store")
    r = FaceRecordReader(store)
    start = len(r) // 2
    tail_payloads = {bytes(r.payload(i)) for i in range(start, len(r))}
    r.close()
    out = str(tmp_path / "tail.bin")
    issame = build_pair_bin(store, out, 20, seed=3, start=start)
    with open(out, "rb") as f:
        payloads, labels = pickle.load(f, encoding="bytes")
    assert len(payloads) == 2 * len(issame) == 40
    assert all(bytes(p) in tail_payloads for p in payloads)


def test_foreign_bin_loads(case):
    from vlsfr_tpu.eval.verification import load_insightface_bin

    bin_path, issame, _ = case
    with open(bin_path, "rb") as f:
        payload = pickle.load(f, encoding="bytes")
    assert isinstance(payload, tuple) and len(payload) == 2
    imgs, labels = load_insightface_bin(bin_path, 112)
    assert imgs.shape == (2 * len(issame), 112, 112, 3)
    np.testing.assert_array_equal(labels, issame)
    # normalized per the shared image contract ((x-127.5)/128)
    assert -1.0 <= imgs.min() and imgs.max() <= 1.0


def test_torch_and_flax_stacks_agree(case):
    from cross_stack_eval import our_stack_eval, torch_reference_eval

    bin_path, _, tm = case
    ref = torch_reference_eval(bin_path, 112, tm)
    ours = our_stack_eval(bin_path, 112, tm)
    # same file, same weights, two independent decode+embed+protocol
    # pipelines: accuracies must agree to protocol resolution
    assert ours["acc"] == pytest.approx(ref["acc"], abs=0.01)
    assert ours["tar_far1e2"] == pytest.approx(ref["tar_far1e2"], abs=0.02)
