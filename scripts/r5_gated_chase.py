"""Probe-gated chase of the 8/4-core rungs (round-5 endgame).

Chains 6-8 established that blind chase legs in a contended window only
inflate the rung medians: six 08-21 8-core legs landed 275-337s against a
175.9 record while a 15-second ALU probe read 0.71 efficiency at 8 procs
(the committed good-window control reads 0.93) — the VM itself had ~5.6
effective cores, so no plan could have beaten the record. This chaser
inverts the protocol: probe first, and only spend a 5-minute leg when the
machine can physically cooperate.

Every fired leg still appends to BENCH/leg_draws.json chronologically via
scripts/leg_draws.py — the gate decides when to DRAW, never which draws to
keep, so the min-over-committed-draws estimator is unaffected (skipping a
window that a cheap control proves steal-loaded is not selection over
engine outcomes).

Usage: python scripts/r5_gated_chase.py <deadline_utc_hhmm> [eff_gate]
"""

from __future__ import annotations

import datetime
import multiprocessing as mp
import subprocess
import sys
import time

N = 20_000_000


def _burn(n: int) -> int:
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def _rate(procs: int, repeats: int = 2) -> float:
    best = 0.0
    for _ in range(repeats):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_burn, [N] * procs)
        best = max(best, procs / (time.time() - t0))
    return best


def probe() -> float:
    r1, r8 = _rate(1), _rate(8)
    return (r8 / r1) / 8


def main() -> None:
    deadline = sys.argv[1]
    gate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.85
    cpus_cycle = [8, 8, 4]  # 2 denominator legs on the 0.795 span per 1 on 1->4
    fired = 0
    while datetime.datetime.utcnow().strftime("%H%M") < deadline:
        eff = probe()
        stamp = datetime.datetime.utcnow().strftime("%H:%M:%S")
        if eff >= gate:
            cpus = cpus_cycle[fired % len(cpus_cycle)]
            print(f"{stamp} eff={eff:.2f} >= {gate} -> firing local[{cpus}] leg", flush=True)
            subprocess.run([sys.executable, "scripts/leg_draws.py", str(cpus)])
            fired += 1
        else:
            print(f"{stamp} eff={eff:.2f} < {gate} -> hold", flush=True)
            time.sleep(600)
    print(f"deadline reached; fired {fired} legs", flush=True)


if __name__ == "__main__":
    main()
