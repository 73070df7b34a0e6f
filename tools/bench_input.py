#!/usr/bin/env python
"""Benchmark the host input pipeline (decode + augment + batch assembly).

Verifies the host side can outrun the TPU step rate (the reference's
equivalent is 8 DataLoader worker processes, main.py:104). Reports
images/sec for the FFC pipeline and the DCP planning rate.

Usage:
    python tools/bench_input.py [--store DIR] [--batch 128] [--workers 8]
    (no --store → generates a synthetic one)
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", type=str, default="")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image_size", type=int, default=112)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from vlsfr_tpu.core.dcp_native import create_dcp_manager, native_available
    from vlsfr_tpu.data.pipeline import FFCPipeline
    from vlsfr_tpu.data.records import MultiSourceReader

    store = args.store
    if not store:
        from vlsfr_tpu.data.synthetic import generate_synthetic_store

        store = tempfile.mkdtemp(prefix="vlsfr_benchdata_")
        generate_synthetic_store(store, num_ids=200, images_per_id=10,
                                 image_size=args.image_size)
        print(f"generated synthetic store ({store})")

    reader = MultiSourceReader([store])
    pipe = FFCPipeline(reader, args.batch, args.image_size, num_workers=args.workers,
                       prefetch=4)
    # warm
    pipe.make_batch(0, 0)
    t0 = time.perf_counter()
    n = 0
    for batch in pipe.epoch_iter(0):
        n += 1
        if n >= args.steps:
            break
    dt = time.perf_counter() - t0
    imgs = n * args.batch * 2  # x + y halves
    print(f"pipeline: {imgs / dt:.0f} images/sec "
          f"({1000 * dt / n:.1f} ms/batch, batch {args.batch}, {args.workers} workers)")

    mgr = create_dcp_manager(100_000)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 10**6, size=args.batch)
    y = rng.integers(0, 10**6, size=args.batch)
    t0 = time.perf_counter()
    for _ in range(1000):
        mgr.plan_step(x, y)
    dt = time.perf_counter() - t0
    print(f"dcp planner ({'native' if native_available() else 'python'}): "
          f"{dt / 1000 * 1e6:.0f} us/step at B={args.batch}")
    pipe.close()
    reader.close()


if __name__ == "__main__":
    main()
