"""Supplementary single-leg draws for the scaling evidence.

The full-pair harness (bench_scaling.py) runs each leg ONCE; on this shared
VM a single draw carries one-sided host-steal noise that was measured at up
to +35% on a 10-minute leg (same code, same day: local[4] = 621.2s in the
4→16 pair vs 835.8s in the 1→4 pair). Steal only ever ADDS wall time, so
the minimum over draws is the best estimate of the engine's uncontended
wall, and min-based pair efficiencies are reported next to the as-drawn
pairs in BENCH/BASELINE.md.

Usage: python scripts/leg_draws.py <cpus> — runs the identical scaling
crawl job (same env contract as bench_scaling.SCALE_ENV) at local[<cpus>]
and appends {"cpus", "wall_sec", "urls_per_sec", "images_per_sec"} to
BENCH/leg_draws.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import REPO, run_bench


def main():
    cpus = int(sys.argv[1])
    r = run_bench(cpus)
    c = r["crawl"]
    row = {
        "cpus": cpus,
        "wall_sec": c["wall_sec"],
        "urls_per_sec": c["urls_per_sec_scheduled"],
        "images_per_sec": c["images_per_sec_decoded"],
        "pages": c["pages"],
        # ladder_report.py splits kernel cohorts on this note; every draw at
        # post-e2ef847 HEAD belongs to the new-kernel cohort (override or
        # annotate via SPARK_GRAFT_DRAW_NOTE)
        "note": os.environ.get("SPARK_GRAFT_DRAW_NOTE", "new decode kernel"),
    }
    path = os.path.join(REPO, "BENCH", "leg_draws.json")
    draws = []
    if os.path.exists(path):
        with open(path) as f:
            draws = json.load(f)
    draws.append(row)
    with open(path, "w") as f:
        json.dump(draws, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
