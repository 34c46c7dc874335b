"""Corpus-composition operators: deterministic splits + per-source caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from goribot_spark.functions.sampling import cap_per_source, hash_split

SF_DIR = "/root/testdata/sf0.001"


def test_hash_split_stable_and_proportional(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = hash_split(d, "doc_id").select("doc_id", "split")
    full = {r["doc_id"]: r["split"] for r in s.collect()}
    n = len(full)
    frac_train = sum(1 for v in full.values() if v == "train") / n
    assert 0.8 < frac_train < 0.98  # 90% nominal, small-sample tolerance
    assert set(full.values()) <= {"train", "val", "test"}
    # growth stability: the assignment of a doc must not depend on which
    # other docs are present (the randomSplit failure mode).
    half = hash_split(d.where(F.col("doc_id") % 2 == 0), "doc_id")
    for r in half.select("doc_id", "split").collect():
        assert full[r["doc_id"]] == r["split"]
    # a different salt draws a different assignment
    other = hash_split(d, "doc_id", salt="v2").select("doc_id", "split")
    diff = sum(
        1 for r in other.collect() if full[r["doc_id"]] != r["split"]
    )
    assert diff > 0


def test_cap_per_source(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    capped = cap_per_source(
        d, "source", cap=3, order_exprs=[F.col("n_chars").desc(), F.col("doc_id")]
    )
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in per)
    # kept rows are the longest per source (deterministic tiebreak)
    rows = d.select("doc_id", "source", "n_chars").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((-r["n_chars"], r["doc_id"]))
    expect = set()
    for src, lst in by_src.items():
        for _, doc in sorted(lst)[:3]:
            expect.add(doc)
    got = {r["doc_id"] for r in capped.collect()}
    assert got == expect
