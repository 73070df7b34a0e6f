"""Int8 DCP queue storage ladder on the real chip (ops/qqueue.py).

The fused FFC head is pure queue DMA at Q >> B (docs/PERF.md: the quad
kernel streams plane 0 once per fwd and once per bwd — 2·Q·D bytes/step
·sizeof(dtype)). Int8 storage with a per-row scale cuts that 4x vs f32 /
2x vs bf16 AND roughly doubles the largest pool one chip holds: a
10M-slot [2, Q, 512] queue is 10.2 GB int8 vs 20.5 GB bf16 — BASELINE
config 5's identity count on ONE v5e (reference ffc.py:29 queue_size).

Runs bench.py's ffc mode (the real ir50 train step, donation-threaded,
value-fetch synced) across a (queue_size, queue_dtype) ladder in fresh
subprocesses (clean HBM between configs). Compile through the tunnel is
5-10 min/config cold — run in a background task, no timeout.

Usage: python tools/bench_int8_queue.py [--quick]
  --quick  only the q=1M pair (int8 vs bf16)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
BENCH = os.path.abspath(os.path.join(ROOT, "bench.py"))

LADDER = [
    # (queue_size, dtype, batch) — b128 matches the suite's ffc rows
    (1 << 20, "bfloat16", 128),
    (1 << 20, "int8", 128),
    (1 << 22, "bfloat16", 128),  # 4 GB bf16 — round-2's b128 ceiling case
    (1 << 22, "int8", 128),      # 2 GB int8
    (10_000_000, "int8", 128),   # 10.2 GB: BASELINE config 5 on ONE chip
]

QUICK = [(1 << 20, "bfloat16", 128), (1 << 20, "int8", 128)]


def main() -> None:
    ladder = QUICK if "--quick" in sys.argv else LADDER
    rows = []
    for q, dt, b in ladder:
        env = dict(os.environ)
        env.update({
            "BENCH_MODE": "ffc",
            "BENCH_QUEUE": str(q),
            "BENCH_QUEUE_DTYPE": dt,
            "BENCH_BATCH": str(b),
        })
        print(f"=== q={q} dtype={dt} b={b} ===", flush=True)
        proc = subprocess.run([sys.executable, BENCH], env=env,
                              capture_output=True, text=True)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line.startswith("{"):
            print(f"FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}",
                  flush=True)
            rows.append({"q": q, "dtype": dt, "batch": b, "error": True})
            continue
        r = json.loads(line)
        print(line, flush=True)
        rows.append({"q": q, "dtype": dt, "batch": b,
                     "img_per_sec": r["value"], "mfu": r["vs_baseline"],
                     "step_ms": r["detail"]["step_time_ms"],
                     "hbm_frac": r["detail"].get("hbm_roofline_frac")})
    print("\n=== ladder ===")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
