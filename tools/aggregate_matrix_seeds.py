"""Aggregate multi-seed accuracy-matrix rows into mean±range tables.

Round-4 verdict item 5: every fidelity conclusion rested on one draw per
config, and rank-1/TAR carried no error bars. This tool scans an
ACCURACY.md-style file for raw result records (the ``Raw: `{...}` `` lines
tools/casia_scale_study.py appends, plus records inside ``` blocks), groups
rows whose keys differ only by the ``_sN`` seed suffix, and prints a
markdown table of mean ± half-range for every metric — so conclusions can
quote calibrated spreads instead of single draws.

Usage:
    python tools/aggregate_matrix_seeds.py docs/ACCURACY.md [--prefix j20]
"""

from __future__ import annotations

import argparse
import json
import re


METRICS = [
    ("verification_acc", "verif"),
    ("tar_at_far_1e2", "TAR@1e-2"),
    ("tar_at_far_1e3", "TAR@1e-3"),
    ("ident_rank1", "rank-1"),
    ("ident_rank5", "rank-5"),
    ("bin_verification_acc", "bin acc"),
    ("bin_tar_at_far1e-3", "bin TAR@1e-3"),
    ("final_loss", "loss"),
    ("train_acc", "train_acc"),
]

_SEED_RE = re.compile(r"_s(\d+)$")


def parse_records(text: str) -> dict[str, list[dict]]:
    """Extract {base_key: [result, ...]} from every JSON object found on a
    line that looks like a raw result record (has verification_acc)."""
    groups: dict[str, list[dict]] = {}
    for m in re.finditer(r"\{\"[^\n]*\}", text):
        try:
            obj = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        # records are {key: {metrics...}} or bare {metrics...}
        items = (
            obj.items()
            if obj and all(isinstance(v, dict) for v in obj.values())
            else []
        )
        for key, res in items:
            if "verification_acc" not in res:
                continue
            base = _SEED_RE.sub("", key)
            groups.setdefault(base, []).append(res)
    return groups


def fmt(vals: list[float]) -> str:
    if not vals:
        return "-"
    if len(vals) == 1:
        return f"{vals[0]:.4g}"
    mean = sum(vals) / len(vals)
    half = (max(vals) - min(vals)) / 2
    return f"{mean:.4f}±{half:.4f}"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("--prefix", default="",
                    help="only aggregate row keys containing this substring")
    ap.add_argument("--min_seeds", type=int, default=1,
                    help="only print rows with at least this many repeats")
    args = ap.parse_args()

    with open(args.path) as f:
        groups = parse_records(f.read())

    names = [n for _, n in METRICS]
    print("| head (n seeds) | " + " | ".join(names) + " |")
    print("|" + "---|" * (len(names) + 1))
    for base in sorted(groups):
        if args.prefix and args.prefix not in base:
            continue
        runs = groups[base]
        if len(runs) < args.min_seeds:
            continue
        cells = []
        for key, _ in METRICS:
            vals = [float(r[key]) for r in runs if key in r]
            cells.append(fmt(vals))
        print(f"| {base} ({len(runs)}) | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
