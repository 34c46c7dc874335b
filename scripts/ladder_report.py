"""Summarize the scaling-ladder draws into rung tables and span efficiencies.

Reads BENCH/leg_draws.json (every single-leg draw ever committed,
chronological; the round-2/3 pair-harness legs live separately in
BENCH/scaling_*.json and are not merged here), splits the draws into
kernel cohorts (draws tagged "new decode kernel" vs everything before), and
prints per-rung min/median/count and the N->4N span efficiencies at the
minima. Pure arithmetic over committed artifacts — run it any time; the
BASELINE.md tables are generated from this output so a reader can recompute
every figure from the raw JSON.

Min-over-draws rationale: host steal on this shared VM is one-sided (only
ever ADDS wall time), so each rung's minimum is the tightest available
upper bound on the engine's uncontended wall (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_draws():
    with open(os.path.join(REPO, "BENCH", "leg_draws.json")) as f:
        return json.load(f)


def split_cohorts(draws):
    new = [d for d in draws if "new decode kernel" in d.get("note", "")]
    old = [d for d in draws if "new decode kernel" not in d.get("note", "")]
    return old, new


def rung_table(draws):
    rungs = {}
    for d in draws:
        rungs.setdefault(d["cpus"], []).append(d)
    out = {}
    for cpus in sorted(rungs):
        walls = [d["wall_sec"] for d in rungs[cpus]]
        best = min(rungs[cpus], key=lambda d: d["wall_sec"])
        out[cpus] = {
            "walls": walls,
            "n": len(walls),
            "min": min(walls),
            "median": round(statistics.median(walls), 1),
            "urls_at_min": best.get("urls_per_sec"),
            "images_at_min": best.get("images_per_sec"),
        }
    return out


def spans(table, factor=4):
    out = {}
    for n in sorted(table):
        m = n * factor
        if m in table:
            out[f"{n}->{m}"] = round(table[n]["min"] / (factor * table[m]["min"]), 3)
    return out


def doublings(table):
    out = {}
    for n in sorted(table):
        m = n * 2
        if m in table:
            out[f"{n}->{m}"] = round(table[n]["min"] / (2 * table[m]["min"]), 2)
    return out


def show(name, draws):
    t = rung_table(draws)
    print(f"\n== {name} cohort ({len(draws)} draws) ==")
    print(f"{'cores':>5} {'n':>3} {'min':>8} {'median':>8}  {'URLs/s@min':>10} {'img/s@min':>10}  walls")
    for cpus, r in t.items():
        walls = ", ".join(f"{w:.1f}" for w in r["walls"])
        u = f"{r['urls_at_min']:,.0f}" if r["urls_at_min"] else "-"
        i = f"{r['images_at_min']:,.0f}" if r["images_at_min"] else "-"
        print(f"{cpus:>5} {r['n']:>3} {r['min']:>8.1f} {r['median']:>8.1f}  {u:>10} {i:>10}  {walls}")
    print("4x spans (min-based):", spans(t))
    print("doublings (min-based):", doublings(t))
    return t


def main():
    draws = load_draws()
    old, new = split_cohorts(draws)
    show("pre-r5 kernel (rounds 1-4 + early r5)", old)
    show("new decode kernel (r5, commit e2ef847+)", new)
    if "--json" in sys.argv:
        t = rung_table(new)
        print(json.dumps({"new_kernel": {str(k): v for k, v in t.items()},
                          "spans_4x": spans(t), "doublings": doublings(t)}))


if __name__ == "__main__":
    main()
