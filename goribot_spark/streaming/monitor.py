"""Continuous-mode monitor — Structured Streaming over the crawl tables.

The reference's continuous mode is ``AutoStop=false`` polling plus the
``SpiderLogPrint`` 5-second throughput logger (goribot.go:227-239,
extensions.go:216-247). The crawl loop itself must stay batch-iterative
(wave N+1 depends on dedup state after wave N — SURVEY.md §1.7), but the
*observability* side maps cleanly onto Structured Streaming: the store's
per-wave parquet appends form a file-source stream, so a monitor job can
tail ``results``/``metrics`` from a separate session while the crawl runs —
the Spark-native replacement for goribot's logger goroutine and the
manager's item-collector loop (manager.go:59-96).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goribot_spark import schemas


def results_stream(spark: SparkSession, run_dir: str) -> DataFrame:
    """Streaming DataFrame of results rows as waves commit (file source —
    each wave's parquet files arrive as new stream inputs)."""
    return (
        spark.readStream.schema(schemas.RESULTS)
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(run_dir, "results", "wave=*"))
    )


def throughput_per_wave(stream: DataFrame) -> DataFrame:
    """SpiderLogPrint analog: rows + distinct sources + decode failures per
    wave, updated as waves land."""
    return stream.groupBy("wave").agg(
        F.count(F.lit(1)).alias("items"),
        # exact distinct is unsupported on streams; HLL sketch per contract
        F.approx_count_distinct("src_url").alias("approx_distinct_pages"),
        F.sum(F.col("decode_error").isNotNull().cast("long")).alias("decode_failures"),
    )


def run_monitor_once(spark: SparkSession, run_dir: str, out_dir: str) -> None:
    """Drain everything currently committed (Trigger.AvailableNow) into a
    console-free sink directory; used by tests and as a template for a live
    ``.trigger(processingTime='5 seconds')`` deployment."""
    q = (
        throughput_per_wave(results_stream(spark, run_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("crawl_monitor")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "_chk"))
        .start()
    )
    q.awaitTermination()
