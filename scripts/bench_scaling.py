"""Scaling-efficiency evidence for the north rule (N → 4N parallelism).

No real cluster exists in this sandbox, so the two-cluster-size criterion is
evidenced by running the identical bench job at local[8] and local[32] on
the same input (same cached fixture, same seed list) in separate JVMs, and
reporting throughput at both plus efficiency = (T_4N / T_N) / 4.

Writes BENCH/BASELINE.md and prints the summary JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n, four_n = 8, 32
    r_n = run_bench(n)
    r_4n = run_bench(four_n)

    def tput(r):
        return r["crawl"]["urls_per_sec_scheduled"] + r["crawl"]["images_per_sec_decoded"]

    eff = (tput(r_4n) / tput(r_n)) / (four_n / n)
    summary = {
        "n_cores": n,
        "four_n_cores": four_n,
        "throughput_n": tput(r_n),
        "throughput_4n": tput(r_4n),
        "scaling_efficiency": round(eff, 3),
        "bench_n": r_n,
        "bench_4n": r_4n,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH — measured throughput & scaling (local-mode evidence)

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox evidence: identical crawl job (cached synthetic graph,
same seeds) at local[{n}] vs local[{four_n}], separate JVMs.

| metric | local[{n}] | local[{four_n}] |
|---|---|---|
| crawl wall sec | {r_n['crawl']['wall_sec']} | {r_4n['crawl']['wall_sec']} |
| URLs/sec fetch-scheduled | {r_n['crawl']['urls_per_sec_scheduled']} | {r_4n['crawl']['urls_per_sec_scheduled']} |
| images/sec decoded | {r_n['crawl']['images_per_sec_decoded']} | {r_4n['crawl']['images_per_sec_decoded']} |
| pages crawled | {r_n['crawl']['pages']} | {r_4n['crawl']['pages']} |
| waves | {r_n['crawl']['waves']} | {r_4n['crawl']['waves']} |

**Combined throughput (urls/s + images/s): {tput(r_n):.1f} → {tput(r_4n):.1f}
⇒ scaling efficiency = ({tput(r_4n):.1f}/{tput(r_n):.1f})/{four_n//n} =
{eff:.3f}**

Reference baseline (goribot README.md:23): >1,000 task/sec on one core
against a trivial local HTTP responder (no parse, no decode, no dedup
table). This engine's per-URL work includes HTML parse, link canonicalize +
xxhash64, dedup anti-join, politeness windows, image decode + phash, and
checkpointed parquet writes per wave.

Raw bench JSON (local[{four_n}]):

```json
{json.dumps(r_4n, indent=1)}
```
"""
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
