"""Microbenchmark: fresh-session resume read cost vs committed-wave count,
before and after store compaction (store.py::CrawlStore.compact).

Builds a synthetic run dir with N committed waves (40-row frontier/consumed/
seen increments each — the drain-tail shape of a long crawl, where per-wave
row counts are small but directory counts grow), then times what a resuming
session pays first: pending_frontier().count() + seen().count() on a fresh
CrawlStore. Usage: python scripts/compact_bench.py [n_waves]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goribot_spark import schemas
from goribot_spark.session import get_spark
from goribot_spark.sources.store import CrawlStore


def build(spark, rd: str, n_waves: int) -> None:
    shutil.rmtree(rd, ignore_errors=True)
    store = CrawlStore(spark, rd)
    base = spark.range(0, 40).select(
        F.concat(F.lit("http://h"), F.col("id")).alias("url"),
        F.col("id").alias("url_hash"),
        F.lit("h").alias("host"),
        F.lit(1).alias("depth"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("discovery_epoch"),
        F.col("id").alias("seq"),
        F.lit(0).alias("retry_count"),
        F.lit(None).cast("string").alias("referer"),
        F.lit("x").alias("handler_id"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    fr = base.select(
        *[F.col(f.name).cast(f.dataType) for f in schemas.FRONTIER.fields]
    ).coalesce(1)
    co = (
        base.select("url_hash", "retry_count", "seq")
        .withColumn("wave", F.lit(0))
        .coalesce(1)
    )
    for w in range(n_waves):
        shift = F.lit(w * 40).cast("long")
        store.write("frontier", w, fr.withColumn("seq", F.col("seq") + shift))
        store.write(
            "consumed",
            w,
            co.withColumn("seq", F.col("seq") + shift).withColumn("wave", F.lit(w)),
        )
        store.write("seen", w, fr.select("url_hash").coalesce(1))
        store.commit_wave(w, {"scheduled": 40}, {})


def fresh_resume_sec(spark, rd: str) -> float:
    s = CrawlStore(spark, rd)
    s.rollback_uncommitted()
    t0 = time.time()
    s.pending_frontier().count()
    s.seen().count()
    return time.time() - t0


def main() -> None:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    spark = get_spark(master="local[8]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rd = "/tmp/compact_bench_run"
    build(spark, rd, n_waves)
    before = [round(fresh_resume_sec(spark, rd), 2) for _ in range(2)]
    t0 = time.time()
    CrawlStore(spark, rd).compact(mode="files")
    compact_sec = round(time.time() - t0, 2)
    after = [round(fresh_resume_sec(spark, rd), 2) for _ in range(2)]
    print(
        json.dumps(
            {
                "n_waves": n_waves,
                "fresh_resume_sec_before": before,
                "compact_sec": compact_sec,
                "fresh_resume_sec_after": after,
            }
        )
    )


if __name__ == "__main__":
    main()
