"""Streaming corpus enrichment: batch/stream parity, watermarked dedup, and
the applyInPandasWithState stateful operator (goribot_spark/streaming/
enrich.py). The crawl commits waves; the stream must see exactly the decoded
rows, compute feature columns identical to the batch expressions, dedup
first-wins on the fingerprint, and keep per-host running totals in the state
store."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goribot_spark.streaming.enrich import (
    caption_corpus_stream,
    cumulative_host_totals,
    dedup_captions,
    enrich_captions,
    run_enrichment_once,
)


@pytest.fixture(scope="module")
def crawled(spark, fx, tmp_path_factory):
    from tests.conftest import crawl

    run = tmp_path_factory.mktemp("enrich_run") / "run"
    eng = crawl(spark, fx, run, ["http://site1.test/p/0"], max_depth=2, max_waves=6)
    return eng, str(run)


def test_stream_enrich_matches_batch(spark, crawled, tmp_path):
    eng, run_dir = crawled
    run_enrichment_once(spark, run_dir, str(tmp_path), query_name="enrich_parity")
    got = spark.sql("select * from enrich_parity")

    decoded = eng.store.read("results").where(F.col("decode_error").isNull())
    batch = enrich_captions(decoded.select("image_id", "caption"))
    # Stream applied first-wins dedup on fp; batch twin: one row per fp.
    expect_fps = {r["fp"] for r in batch.select("fp").distinct().collect()}
    got_rows = got.select("image_id", "fp", "lang_pred", "quality", "n_tokens").collect()
    assert {r["fp"] for r in got_rows} == expect_fps
    assert len(got_rows) == len(expect_fps)  # exactly one survivor per fp

    # Feature parity row-for-row: the stream's survivor must carry the same
    # features the batch expressions compute for that image_id.
    batch_by_id = {
        r["image_id"]: (r["lang_pred"], round(r["quality"], 4), r["n_tokens"])
        for r in batch.select("image_id", "lang_pred", "quality", "n_tokens").collect()
    }
    for r in got_rows:
        assert batch_by_id[r["image_id"]] == (
            r["lang_pred"],
            round(r["quality"], 4),
            r["n_tokens"],
        )


def test_stateful_host_totals(spark, crawled, tmp_path):
    import os

    eng, run_dir = crawled
    q = (
        cumulative_host_totals(caption_corpus_stream(spark, run_dir))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("host_totals")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(str(tmp_path), "_chk_totals"))
        .start()
    )
    q.awaitTermination()
    # Last emitted row per host = the cumulative total; with availableNow the
    # file source may split waves into several micro-batches, so take max.
    rows = spark.sql(
        "select host, max(total_items) total from host_totals group by host"
    ).collect()
    got = {r["host"]: r["total"] for r in rows}
    decoded = eng.store.read("results").where(F.col("decode_error").isNull())
    expect = {
        r["host"]: r["n"]
        for r in decoded.groupBy(
            F.lower(F.parse_url("src_url", F.lit("HOST"))).alias("host")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_dedup_captions_is_first_wins_within_batch(spark, tmp_path):
    """Synthetic micro-check: duplicate fingerprints inside one batch keep
    one row (semantics of dropDuplicatesWithinWatermark)."""
    import os

    src_dir = tmp_path / "src"
    os.makedirs(src_dir)
    spark.createDataFrame(
        [("a", "same text"), ("b", "same text"), ("c", "other text")],
        "image_id string, caption string",
    ).write.mode("overwrite").parquet(str(src_dir / "batch"))
    stream = (
        spark.readStream.schema("image_id string, caption string")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src_dir / "*"))
        .select("*", F.current_timestamp().alias("arrived_at"))
    )
    q = (
        dedup_captions(enrich_captions(stream))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_micro")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "_chk"))
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select image_id, fp from dedup_micro").collect()
    assert len(rows) == 2
    assert len({r["fp"] for r in rows}) == 2
