"""Machine-scaling controls for the north-rule measurement (BENCH/*).

Three probes that bound what ANY plan can achieve on this box, run at the
same process counts as the crawl pairs:

  alu    — pure-register integer loop (no memory traffic): how many
           genuinely independent cores the VM provides.
  membw  — streaming numpy reductions (in-child timing, GB/s): the SHARED
           memory-bus ceiling. On a real cluster each node brings its own
           memory bus (like disks), so this is a single-box artifact, not
           an engine property.
  decode — the engine's actual dominant kernel (PNG decode + phash over the
           bench images via with_decoded) inside Spark at local[N]: where
           the pipeline's own scaling sits between those two bounds.

Writes BENCH/controls.json. Run uncontended, after the pair runs.
Usage: python scripts/scale_controls.py [procs...]   (default 1 2 4 8)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _alu_burn(n: int) -> int:
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


_MEMBW_BYTES = 200_000_000
_MEMBW_PASSES = 32


def _membw_burn(_: int) -> float:
    """Return seconds spent STREAMING _MEMBW_PASSES x _MEMBW_BYTES, timed
    inside the child. The previous probe timed np.random.bytes generation
    (0.2-1.7s of RNG/ cold-init CPU) against 0.1s of actual sums at the
    pool level, so its 'bandwidth' numbers were dominated by fork/init
    noise and read physically-impossible superlinear across rungs."""
    import time

    import numpy as np

    a = np.arange(_MEMBW_BYTES // 8, dtype=np.uint64)
    b = 0
    t0 = time.time()
    for _ in range(_MEMBW_PASSES):
        b ^= int(a.sum())
    elapsed = time.time() - t0
    return elapsed if b >= 0 else elapsed


REPEATS = int(os.environ.get("SPARK_GRAFT_CONTROL_REPEATS", "3"))


def pool_rate(fn, procs: int, arg: int) -> float:
    """Best of REPEATS trials: host-steal noise is one-sided (it only adds
    time), so max-rate estimates the machine's actual capability; single
    draws were observed 20x apart on this box."""
    best = 0.0
    for _ in range(REPEATS):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(fn, [arg] * procs)
        best = max(best, procs / (time.time() - t0))
    return best


def membw_gbps(procs: int) -> float:
    """Aggregate streaming bandwidth in GB/s: every child streams the same
    bytes concurrently; the slowest child's in-child streaming time (pool
    spawn and numpy init excluded) bounds the window in which all
    procs x bytes moved. Best of REPEATS, same one-sided-steal rationale."""
    best = 0.0
    total = procs * _MEMBW_BYTES * _MEMBW_PASSES
    for _ in range(REPEATS):
        with mp.Pool(procs) as p:
            times = p.map(_membw_burn, [0] * procs)
        best = max(best, total / max(times) / 1e9)
    return best


_DECODE_SNIPPET = """
import sys, time
sys.path.insert(0, {repo!r})
from goribot_spark.session import get_spark
from goribot_spark.functions.imaging import with_decoded
from pyspark.sql import functions as F
cpus = {cpus}
spark = get_spark(app_name="decode-control", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
imgs = spark.read.parquet({fx!r} + "/images.parquet").select("image_id", "bytes")
big = imgs.crossJoin(spark.range({reps}).select(F.col("id").alias("rep")))
big = big.repartition(cpus * 2).persist(); n = big.count()
t0 = time.time()
with_decoded(big).select(F.sum(F.col("phash").isNotNull().cast("long"))).collect()
print("RATE", n / (time.time() - t0))
"""


def decode_rate(cpus: int, fx: str, reps: int = 30) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _DECODE_SNIPPET.format(repo=REPO, cpus=cpus, fx=fx, reps=reps)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RATE")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"decode_rate child failed (rc={out.returncode}); "
            f"stderr tail: {out.stderr[-2000:]}"
        )
    return float(lines[-1].split()[1])


def main() -> None:
    procs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    fx = os.environ.get("SPARK_GRAFT_BENCH_FX", "/tmp/goribot_scaling_fx")
    # merge into any existing controls.json so upper-rung runs (e.g. 16/32)
    # extend the 1-8 baseline instead of discarding it; a re-run at an
    # existing proc count keeps the better (max-rate) measurement since
    # host steal only ever subtracts from a rate probe
    path = os.path.join(REPO, "BENCH", "controls.json")
    out = {"procs": [], "alu": {}, "membw_gbps": {}, "decode_per_sec": {}}
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        for k in ("alu", "membw_gbps", "decode_per_sec"):
            out[k].update(prior.get(k, {}))
        out["procs"] = list(prior.get("procs", []))
    out["procs"] = sorted(set(out["procs"]) | set(procs))
    for p in procs:
        out["alu"][str(p)] = max(
            out["alu"].get(str(p), 0.0), round(pool_rate(_alu_burn, p, 30_000_000), 3)
        )
        out["membw_gbps"][str(p)] = max(
            out["membw_gbps"].get(str(p), 0.0), round(membw_gbps(p), 2)
        )
    if os.path.isdir(os.path.join(fx)):
        for p in procs:
            out["decode_per_sec"][str(p)] = max(
                out["decode_per_sec"].get(str(p), 0.0),
                round(max(decode_rate(p, fx) for _ in range(REPEATS)), 1),
            )
    all_procs = out["procs"]
    for k in ("alu", "membw_gbps", "decode_per_sec"):
        v = out[k]
        lo, hi = str(all_procs[0]), str(all_procs[-1])
        if lo in v and hi in v and v[lo]:
            out[f"{k}_speedup_{lo}to{hi}"] = round(v[hi] / v[lo], 2)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
