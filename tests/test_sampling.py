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


def test_cap_per_source_null_sources_capped(spark):
    """NULL-source rows form one capped group: the equi-join split would
    otherwise route every null row to the untouched light branch (NULL
    never equi-matches the over-cap list) and the cap guarantee dies for
    missing-source docs."""
    rows = [(i, None, i) for i in range(500)] + [(1000 + j, "a", j) for j in range(3)]
    d = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    capped = cap_per_source(d, "source", cap=40).collect()
    nulls = [r for r in capped if r["source"] is None]
    assert len(nulls) == 40
    assert {r["doc_id"] for r in nulls} == set(range(40))  # deterministic rank
    assert len([r for r in capped if r["source"] == "a"]) == 3
    assert set(capped[0].asDict()) == {"doc_id", "source", "n_chars"}  # no _src_key


def test_cap_per_source_two_level_skew(spark):
    """One source at 100x the others: the 2-level plan must (a) return
    exactly the single-window answer, and (b) never run a per-source window
    over the full frame — under-cap sources bypass via a broadcast anti-join
    and only the over-cap sources are windowed, with a salted local
    pre-prune bounding any one window partition."""
    import pandas as pd

    rows = [(i, "hot", i % 997) for i in range(20_000)]
    rows += [(100_000 + s * 100 + j, f"src{s}", j) for s in range(20) for j in range(5)]
    d = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"]),
        "doc_id long, source string, n_chars long",
    )
    capped = cap_per_source(
        d, "source", cap=10, order_exprs=[F.col("n_chars").desc(), F.col("doc_id")]
    )
    got = {(r["doc_id"], r["source"]) for r in capped.collect()}
    # expected: hot keeps its top-10 (n_chars desc, doc_id asc); small
    # sources (5 rows < cap) pass through untouched
    hot_sorted = sorted(
        (r for r in rows if r[1] == "hot"), key=lambda r: (-r[2], r[0])
    )[:10]
    expect = {(r[0], r[1]) for r in hot_sorted}
    expect |= {(r[0], r[1]) for r in rows if r[1] != "hot"}
    assert got == expect
    # plan shape: the 2-level split is a broadcast semi/anti pair, and the
    # windows sit on the heavy branch only (2 Window nodes, not 1-over-all)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2
