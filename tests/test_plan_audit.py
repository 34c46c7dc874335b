"""Plan audits: the scale claims as executable assertions.

Every `queries()` entry is planned at sf0.001 and its physical plan audited:
no CartesianProduct anywhere outside the documented sampled-audit allowlist
(a broadcast nested loop — the O(N·Q) scan of the ANN baselines — is fine; an
unbounded N×N cartesian is not), and parquet scans prune to the columns the
query needs (ReadSchema, the free win Catalyst gives a declarative plan).

Also proves the SCALE.md §1 bucketing story on real tables: two tables
bucketed on the join key join with zero Exchange operators — the no-shuffle
form the frontier/seen anti-join takes on Iceberg at 10^10 rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# The one intentional cross join: the sampled exact-audit twin of the LSH
# near-dup path (runs on a deterministic 1/4 subsample, never the full
# corpus). Everything else must be join-keyed or broadcast.
CARTESIAN_ALLOWLIST = {"embedding_neardup_exact_audit"}


def physical_plan(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString()


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_no_cartesian_product(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = physical_plan(df)
    if name in CARTESIAN_ALLOWLIST:
        return
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product:\n{plan}"


@pytest.mark.parametrize(
    "name,table,needed,banned",
    [
        # Projection pruning must reach the scan: doc_tokens never reads the
        # url/lang columns, emb_norms never reads dim.
        ("doc_tokens", "documents", ["doc_id", "text", "n_chars"], ["url", "lang"]),
        ("emb_norms", "embeddings", ["vec_id", "label", "embedding"], ["dim"]),
        # The left_anti seen-probe shape reads only the keys it joins on.
        ("customers_without_orders", "orders", ["o_custkey"], ["o_totalprice"]),
    ],
)
def test_scan_column_pruning(spark, name, table, needed, banned):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = physical_plan(df)
    scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and f"{table}.parquet" in ln
    ]
    assert scans, f"no parquet scan of {table} found in {name}:\n{plan}"
    for ln in scans:
        schema = ln.split("ReadSchema:")[-1] if "ReadSchema:" in ln else ln
        for col in banned:
            assert f"{col}:" not in schema, (
                f"{name} reads un-needed column {table}.{col}: {ln}"
            )


def test_broadcast_dims_in_fetch_join_shape(spark):
    """orders_by_nation (J2/J5 shape) must broadcast the nation dim, never
    shuffle the fact side for it."""
    df = entry_mod.q_orders_by_nation(spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """SCALE.md §1: with frontier/seen bucketed on url_hash the pending
    anti-join needs no shuffle. Demonstrated with Spark bucketed tables (the
    sandbox's stand-in for Iceberg storage-partitioned joins): both sides
    bucketed+sorted on the key -> SortMergeJoin with zero Exchange."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        frontier = spark.range(0, 10_000).select(
            F.col("id").alias("url_hash"), (F.col("id") % 7).alias("priority")
        )
        consumed = spark.range(0, 10_000, 2).select(F.col("id").alias("url_hash"))
        for name, df in [("t_frontier_b", frontier), ("t_consumed_b", consumed)]:
            spark.sql(f"drop table if exists {name}")
            (
                df.write.mode("overwrite")
                .option("path", str(tmp_path / name))
                .bucketBy(8, "url_hash")
                .sortBy("url_hash")
                .saveAsTable(name)
            )
        pending = spark.table("t_frontier_b").join(
            spark.table("t_consumed_b"), "url_hash", "left_anti"
        )
        plan = physical_plan(pending)
        assert "Exchange" not in plan, f"bucketed anti-join still shuffles:\n{plan}"
        assert pending.count() == 5_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("drop table if exists t_frontier_b")
        spark.sql("drop table if exists t_consumed_b")


def test_ann_ivf_recall_vs_brute_force(spark):
    """IVF (hash-sampled seeds, 2 Lloyd steps) with nprobe=3 of 8 lists must
    agree with the exact top-5 for a large fraction of (query, neighbor)
    hits on the test corpus — the recall-audit pattern every approximate
    path here ships with."""
    e = entry_mod._t(spark, SF_DIR, "embeddings")
    from goribot_spark.functions.similarity import ann_topk_ivf, cosine_topk

    q = e.where(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(e, q, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_ivf(
            e, q, k=5, num_centroids=8, nprobe=3, lloyd_iters=2
        ).collect()
    }
    assert len(ivf) == len(exact)
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"
