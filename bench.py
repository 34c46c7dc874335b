"""Benchmark harness — the driver runs this per-round.

Two parts:
  1. Crawl throughput: full BFS crawl of a cached bench-scale synthetic web
     graph (~26k pages, 4k images) measuring frontier URLs/sec
     fetch-scheduled and images/sec decoded (BASELINE.md targets).
  2. Query latency: every ``__spark_entry__.queries()`` entry timed at
     ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "crawl": {...}}

Parallelism comes from ``$SPARK_GRAFT_CPUS`` (default 32) so the same
harness evidences N→4N scaling (scripts/bench_scaling.py runs it at 8 and
32 and writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Wide, shallow graph (~27k pages over 220 hosts, 5 BFS levels): a
# production frontier is wide — waves of thousands of URLs — so the bench
# measures wave *throughput*, not driver iteration latency. A deep narrow
# graph (e.g. depth 6, 20 hosts) measures the opposite regime: many small
# latency-bound waves; see BENCH/BASELINE.md for the distinction.
BENCH_FX = os.environ.get("SPARK_GRAFT_BENCH_FX", "/tmp/goribot_bench_fx")
BENCH_HOSTS = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "220"))
BENCH_DEPTH = int(os.environ.get("SPARK_GRAFT_BENCH_DEPTH", "4"))
BENCH_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "8192"))
BENCH_MAX_REFS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REFS", "5"))
BENCH_FLAKY = float(os.environ.get("SPARK_GRAFT_BENCH_FLAKY", "0.05"))


def ensure_bench_fixture() -> str:
    marker = os.path.join(
        BENCH_FX,
        f"ok_{BENCH_HOSTS}_{BENCH_DEPTH}_{BENCH_IMAGES}_{BENCH_MAX_REFS}_{BENCH_FLAKY}",
    )
    if not os.path.exists(marker):
        shutil.rmtree(BENCH_FX, ignore_errors=True)
        from goribot_spark.sources.fixtures import generate_all

        generate_all(
            BENCH_FX,
            n_hosts=BENCH_HOSTS,
            depth=BENCH_DEPTH,
            n_images=BENCH_IMAGES,
            max_refs=BENCH_MAX_REFS,
            flaky_frac=BENCH_FLAKY,
        )
        open(marker, "w").close()
    return BENCH_FX


def bench_crawl(spark) -> dict:
    from pyspark.sql import functions as F

    from goribot_spark.engine import CrawlConfig, CrawlEngine

    fx = ensure_bench_fixture()
    run_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_RUN_DIR",
        "/dev/shm/goribot_bench_run" if os.path.isdir("/dev/shm") else "/tmp/goribot_bench_run",
    )
    shutil.rmtree(run_dir, ignore_errors=True)
    seeds = [f"http://site{s}.test/p/0" for s in range(BENCH_HOSTS)]
    # max_waves is a safety cap, not the expected count: BFS depth+1 waves
    # plus a retry tail (flaky pages re-enter up to 2 later waves each).
    cfg = CrawlConfig(retry_max=2, max_waves=48)
    eng = CrawlEngine(spark, fx, run_dir, cfg)
    t0 = time.time()
    eng.seed(seeds)
    waves = eng.run()
    wall = time.time() - t0
    scheduled = sum(w.get("scheduled", 0) for w in waves)
    images = sum(w.get("images", 0) for w in waves)
    results = eng.store.read("results")
    decoded_ok = results.where(F.col("decode_error").isNull()).count()
    return {
        "pages": scheduled,
        "waves": len(waves),
        "wall_sec": round(wall, 2),
        "urls_per_sec_scheduled": round(scheduled / wall, 1),
        "images_decoded": decoded_ok,
        "images_per_sec_decoded": round(images / wall, 1),
    }


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    out = {}
    for name, fn in E.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Shuffle on tmpfs (must be set before the JVM starts): single-node
    # stand-in for per-executor local disks (BENCH/BASELINE.md).
    if "SPARK_LOCAL_DIRS" not in os.environ and os.path.isdir("/dev/shm"):
        os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/goribot_spark_local"
    from goribot_spark.session import get_spark

    spark = get_spark(app_name="goribot-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    crawl = bench_crawl(spark)
    # SPARK_GRAFT_SKIP_QUERIES=1 → crawl-only (used by the scaling bench,
    # whose criterion concerns the crawl job).
    skip_q = os.environ.get("SPARK_GRAFT_SKIP_QUERIES") == "1"
    queries = {} if skip_q else bench_queries(spark, sf_dir)
    total = time.time() - t0
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "bench_total_sec(crawl+queries)",
                "value": round(total, 2),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": cpus,
                "crawl": crawl,
            }
        )
    )


if __name__ == "__main__":
    main()
