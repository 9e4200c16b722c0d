"""Per-query minima comparison across bench control rounds.

Methodology (SCALE.md "CPU-steal variance"): single runs are
meaningless in this environment's 1.9x steal band, so compare PER-QUERY
MINIMA over a round's controls; round 11 adds the calm-window detector
(bench.py::classify_calm) and this script therefore prefers CALM
controls — pass --calm-only to restrict the newer round's controls to
runs whose embedded (or recomputed) calm_probe verdict is true.

Usage::

    python scripts/bench_compare.py BENCH_r11_control_*.json --vs BENCH_r10_control_*.json
    python scripts/bench_compare.py --calm-only BENCH_r11_control_*.json --vs ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _minima(paths: list[str], calm_only: bool) -> tuple[dict, int]:
    mins: dict[str, float] = {}
    used = 0
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        q = d.get("queries")
        if not q:
            continue
        if calm_only:
            cp = d.get("calm_probe") or bench.classify_calm(q, d.get("sf"))
            if cp.get("calm") is not True:
                continue
        used += 1
        for k, v in q.items():
            if k not in mins or v < mins[k]:
                mins[k] = v
    return mins, used


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("new", nargs="+")
    ap.add_argument("--vs", nargs="+", required=True)
    ap.add_argument("--calm-only", action="store_true",
                    help="restrict NEW controls to calm-classified runs")
    ap.add_argument("--flag", type=float, default=1.10,
                    help="report queries at or above this ratio")
    args = ap.parse_args()

    new, n_new = _minima(args.new, args.calm_only)
    old, n_old = _minima(args.vs, False)
    common = sorted(set(new) & set(old))
    tot_new = sum(new[k] for k in common)
    tot_old = sum(old[k] for k in common)
    flagged = sorted(
        ((new[k] / old[k], k) for k in common if old[k] > 0
         and new[k] / old[k] >= args.flag),
        reverse=True,
    )
    print(json.dumps({
        "controls_used_new": n_new,
        "controls_used_old": n_old,
        "common_queries": len(common),
        "total_new_sec": round(tot_new, 1),
        "total_old_sec": round(tot_old, 1),
        "ratio": round(tot_new / tot_old, 3) if tot_old else None,
        "flagged": [
            {"query": k, "ratio": round(r, 3),
             "new_sec": new[k], "old_sec": old[k]}
            for r, k in flagged
        ],
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
