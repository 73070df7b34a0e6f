"""Offline tool smoke tests (reference data/creat_lmdb.py + test_lmdb.py
equivalents) driven through their CLIs."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run_tool(*args):
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, env=ENV, cwd=REPO,
        timeout=300,
    )


def test_make_dataset_from_folder_tree(tmp_path):
    # build a tiny folder-of-identities tree
    for ident in range(3):
        d = tmp_path / "src" / f"person_{ident}"
        d.mkdir(parents=True)
        for j in range(2):
            img = np.full((40, 40, 3), 50 * ident + 10 * j, np.uint8)
            cv2.imwrite(str(d / f"{j}.jpg"), img)
    out = str(tmp_path / "store")
    r = run_tool("tools/make_dataset.py", "--src", str(tmp_path / "src"), "--out", out,
                 "--image_size", "32")
    assert r.returncode == 0, r.stderr
    assert "wrote 6 records" in r.stdout

    from vlsfr_tpu.data.records import MultiSourceReader

    m = MultiSourceReader([out])
    assert len(m) == 6
    assert m.num_class == 3
    m.close()

    r2 = run_tool("tools/inspect_dataset.py", "--store", out, "--verify_all")
    assert r2.returncode == 0, r2.stderr
    assert "0 failures" in r2.stdout


def test_make_dataset_synthetic_cli(tmp_path):
    out = str(tmp_path / "syn")
    r = run_tool("tools/make_dataset.py", "--synthetic", "--out", out,
                 "--num_ids", "4", "--images_per_id", "2", "--image_size", "32")
    assert r.returncode == 0, r.stderr
    from vlsfr_tpu.data.records import MultiSourceReader

    m = MultiSourceReader([out])
    assert len(m) == 8
    m.close()


def test_bench_input_cli():
    r = run_tool("tools/bench_input.py", "--steps", "3", "--batch", "8",
                 "--image_size", "32", "--workers", "2")
    assert r.returncode == 0, r.stderr
    assert "images/sec" in r.stdout


def test_train_cli_smoke(tmp_path):
    """The quickstart CLI end-to-end: synthetic data, toy net, 1 epoch."""
    r = run_tool(
        "train.py", "--net_type", "toy", "--synthetic", "--batch_size", "8",
        "--feat_dim", "16", "--queue_size", "16",
        "--saved_dir", str(tmp_path / "ckpt"),
        "--set", "data.image_size=32", "--set", "data.synthetic_ids=10",
        "--set", "data.synthetic_images_per_id=8", "--set", "optim.epochs=1",
        "--set", "model.dtype=float32", "--set", "data.num_workers=2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "training done" in r.stdout
    # checkpoint written and reloadable by a resume run
    r2 = run_tool(
        "train.py", "--net_type", "toy", "--synthetic", "--batch_size", "8",
        "--feat_dim", "16", "--queue_size", "16",
        "--saved_dir", str(tmp_path / "ckpt"),
        "--set", "data.image_size=32", "--set", "data.synthetic_ids=10",
        "--set", "data.synthetic_images_per_id=8", "--set", "optim.epochs=1",
        "--set", "model.dtype=float32", "--set", "data.num_workers=2",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed from checkpoint" in (r2.stdout + r2.stderr)
