"""Int8-COMPUTE ladder on the real chip (pool.queue_int8_compute).

At >=4M queue slots the fused quad head is MXU-bound (docs/PERF.md: ~42
ms of streamed dots vs ~13 ms of int8 queue DMA at 10.5M slots, b=128).
int8-compute quantizes the probe rows too and runs every clean-tile
streamed dot int8xint8->int32 — nominally 2x MXU throughput on v5e
(tools/probe_int8_mxu.py measured the raw ratio). This ladder measures
the real train-step effect, plus the session-5 kernel deltas that land
in the same regime: the int8-aware VMEM clamp (tile 1280 at q=10*2^20)
and the shared clean-tile top-k merge.

Fidelity was closed first (docs/ACCURACY.md ffc_int8c row: matches the
f32 control on every CASIA-scale holdout metric).

Runs bench.py BENCH_MODE=ffc in fresh subprocesses (clean HBM between
configs). Cold compiles are 5-10 min through the tunnel — run in a
background task without a timeout.

Usage: python tools/bench_int8_compute.py [--quick]
  --quick  only the q=10*2^20 int8c on/off pair
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
BENCH = os.path.abspath(os.path.join(ROOT, "bench.py"))

Q10 = str(10 << 20)
LADDER = [
    # (tag, env overrides) — all ffc b=128 ir50 int8 queue
    ("q10.5M int8 base", {"BENCH_QUEUE": Q10}),
    ("q10.5M int8c", {"BENCH_QUEUE": Q10, "BENCH_QUEUE_INT8C": "1"}),
    ("q10.5M int8c t1280", {"BENCH_QUEUE": Q10, "BENCH_QUEUE_INT8C": "1",
                            "BENCH_QUEUE_TILE": "1280"}),
    ("q10.5M int8 t1280", {"BENCH_QUEUE": Q10, "BENCH_QUEUE_TILE": "1280"}),
    ("q4M int8c", {"BENCH_QUEUE": str(1 << 22), "BENCH_QUEUE_INT8C": "1"}),
]

QUICK = LADDER[:2]


def main() -> None:
    ladder = QUICK if "--quick" in sys.argv else LADDER
    rows = []
    for tag, overrides in ladder:
        env = dict(os.environ)
        env.update({"BENCH_MODE": "ffc", "BENCH_BATCH": "128",
                    "BENCH_QUEUE_DTYPE": "int8"})
        env.update(overrides)
        print(f"=== {tag} ===", flush=True)
        proc = subprocess.run([sys.executable, BENCH], env=env,
                              capture_output=True, text=True)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line.startswith("{"):
            print(f"FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}",
                  flush=True)
            rows.append({"tag": tag, "error": True})
            continue
        row = json.loads(line)
        row["tag"] = tag
        rows.append(row)
        print(json.dumps(row), flush=True)
    print("\n=== summary ===")
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
