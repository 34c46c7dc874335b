"""Continuous corpus enrichment — the training-data pipeline as a stream.

The crawl loop stays batch-iterative (wave N+1 depends on post-wave-N dedup
state, SURVEY.md §1.7), but everything *downstream* of the results table is
embarrassingly streamable: as each wave's parquet files commit, a Structured
Streaming job can enrich the new captions (language ID, quality score, token
count, fingerprint — all JVM expressions, so they run identically on static
and streaming frames), drop near-duplicate rows inside a watermark window,
and maintain running per-host totals with a custom stateful operator
(``applyInPandasWithState`` — the Spark-native form of the reference's
item-collector goroutine state, manager.go:59-96).

On a cluster this is the standing enrichment job next to the crawl: crawl
commits Iceberg snapshots, the stream tails them with exactly-once file
tracking, and the enriched corpus lands in its own table without ever
re-scanning history.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from goribot_spark.functions.text import fingerprint, lang_id, quality_score, token_count
from goribot_spark.operators.discover import host_of
from goribot_spark.streaming.monitor import results_stream


def caption_corpus_stream(spark: SparkSession, run_dir: str) -> DataFrame:
    """Streaming view of the crawl output as a text corpus: one row per
    decoded image-caption pair, stamped with an arrival timestamp (the
    results table carries no event time — captions become 'events' when
    their wave commits, so arrival time IS the event time here)."""
    return (
        results_stream(spark, run_dir)
        .where(F.col("decode_error").isNull())
        .select(
            "image_id",
            "caption",
            "src_url",
            "wave",
            host_of(F.col("src_url")).alias("host"),
            F.current_timestamp().alias("arrived_at"),
        )
    )


def enrich_captions(stream: DataFrame, text_col: str = "caption") -> DataFrame:
    """Attach the text-pipeline features to a (possibly streaming) frame.
    Pure Catalyst expressions — whole-stage codegen, no Python crossing, and
    the exact same columns the batch queries (doc_lang/doc_quality/...)
    compute, so batch backfills and the stream agree row-for-row."""
    t = F.col(text_col)
    return stream.select(
        "*",
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        token_count(t).alias("n_tokens"),
        fingerprint(t).alias("fp"),
    )


def dedup_captions(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming first-wins dedup on the text fingerprint: state is bounded
    by the watermark (a fingerprint seen longer ago than the horizon is
    evictable), which is what makes exact streaming dedup feasible at crawl
    scale — the batch twin (training_set's first-wins window) handles full-
    history dedup in the nightly compaction instead."""
    return stream.withWatermark("arrived_at", watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


_HOST_TOTALS_SCHEMA = "host string, total_items long, batches long"
_HOST_STATE_SCHEMA = "total_items long, batches long"


def _update_host_totals(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (host,) = key
    total, batches = state.get if state.exists else (0, 0)
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    total, batches = total + n, batches + 1
    state.update((total, batches))
    yield pd.DataFrame({"host": [host], "total_items": [total], "batches": [batches]})


def cumulative_host_totals(stream: DataFrame) -> DataFrame:
    """Running per-host item totals across micro-batches via
    ``applyInPandasWithState`` — the custom-stateful-operator slot: state
    lives in the state store (checkpointed, executor-partitioned by host),
    emission is one updated row per host per batch. The pattern generalizes
    to per-host crawl session state (auth tokens, adaptive politeness)
    that must survive between micro-batches without a driver round-trip."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("host").applyInPandasWithState(
        _update_host_totals,
        outputStructType=_HOST_TOTALS_SCHEMA,
        stateStructType=_HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_enrichment_once(
    spark: SparkSession, run_dir: str, out_dir: str, query_name: str = "corpus_enrich"
) -> None:
    """Drain all committed waves through enrich + dedup into a memory sink
    (Trigger.AvailableNow) — the test/backfill form of the standing job; a
    deployment swaps the sink for the corpus table and a processing-time
    trigger."""
    import os

    q = (
        dedup_captions(enrich_captions(caption_corpus_stream(spark, run_dir)))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "_chk_enrich"))
        .start()
    )
    q.awaitTermination()
