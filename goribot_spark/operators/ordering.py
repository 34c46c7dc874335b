"""Crawl-order keys + distributed deterministic global ranking (O1-O3).

The reference's queue position (scheduler.go:39-68) becomes explicit ordering
columns. A naive global ``row_number() OVER (ORDER BY ...)`` collapses the
wave to one partition — unacceptable at 10^10-frontier scale — so
:func:`with_global_rank` computes the same deterministic total order
distributed: range-partition on the sort keys, rank within each (sorted)
partition, then add cumulative partition offsets (a config-scale collect).
The resulting rank is independent of partition boundaries, so it is stable
across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bfs_order() -> list[Column]:
    """FIFO (scheduler.go:39-49): oldest discovery first, then insert order."""
    return [
        F.col("priority").asc(),
        F.col("discovery_epoch").asc(),
        F.col("seq").asc(),
    ]


def dfs_order() -> list[Column]:
    """LIFO (scheduler.go:62-64): newest insert first. goribot pushes each new
    task at the queue head, so the most recently discovered URL pops first —
    exactly descending ``seq`` (seq is monotone in discovery time), which
    also reproduces the head-push sibling reversal."""
    return [F.col("priority").asc(), F.col("seq").desc()]


def with_global_rank(
    df: DataFrame,
    keys: list[Column],
    out_col: str = "seq",
    base: int = 0,
    num_partitions: int | None = None,
    return_total: bool = False,
    cache_registry: list | None = None,
    single_partition: bool = False,
):
    """Deterministic 0-based global rank by ``keys`` (must be a total order),
    without a single-partition sort: rank = intra-partition row_number +
    cumulative count of preceding range partitions.

    With ``return_total`` also returns the row count (already computed for
    the offsets — saves callers an extra action).

    ``single_partition=True`` is the SMALL-INPUT fast path: a plain
    row_number over one coalesced partition — identical ranks (same total
    order), but skips the range shuffle, the persist, and the per-partition
    counts job, which dominate wave cost on drain-tail waves. Callers flip
    it adaptively (engine: wave size threshold); never use it on
    frontier-scale inputs."""
    if single_partition:
        # repartition(1), NOT coalesce(1): coalesce collapses the UPSTREAM
        # stages (parse/urljoin/canonicalize UDFs) to one task; the shuffle
        # boundary keeps them at full parallelism and only the final tiny
        # sort runs single-partition (measured 10s → 2s on a 15k-page wave).
        s = df.repartition(1)
        s = s.persist()
        if cache_registry is not None:
            cache_registry.append(s)
        total = s.count()
        w = Window.orderBy(*keys)
        out = s.withColumn(
            out_col, (F.row_number().over(w) - 1 + F.lit(base)).cast("long")
        )
        return (out, total) if return_total else out
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    s = (
        df.repartitionByRange(num_partitions, *keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    s = s.persist()
    if cache_registry is not None:
        # The output plan reads this cache lazily; the caller unpersists it
        # once downstream frames are materialized (engine wave teardown).
        cache_registry.append(s)
    counts = {r["_pid"]: r["count"] for r in s.groupBy("_pid").count().collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.lit(0)
    for pid, off in offsets.items():
        if off:
            off_expr = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(off_expr)
    w = Window.partitionBy("_pid").orderBy(*keys)
    out = (
        s.withColumn(
            out_col,
            (F.row_number().over(w) - 1 + off_expr + F.lit(base)).cast("long"),
        )
        .drop("_pid")
    )
    if return_total:
        return out, acc
    return out
