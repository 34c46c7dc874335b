"""Deterministic corpus-composition operators: split assignment and
per-source rebalancing.

A pretraining corpus build needs (a) a stable train/val/test assignment
that never moves a document between splits as the corpus grows, and (b) a
cap on any one source/domain so boilerplate-heavy hosts cannot dominate
the mixture. Both are pure JVM expressions (md5 / window) — no Python
crossing, no RNG state: the split of a document is a function of its id
alone, so re-runs, backfills, and incremental appends agree byte-for-byte
(the property `df.randomSplit` does NOT have across differently-
partitioned inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    salt: str = "split",
) -> DataFrame:
    """Add ``split`` ∈ {train, val, test} from an md5 bucket of the id.

    bucket = first 4 hex digits of md5("<salt>:<id>") mod 100 — portable
    (DuckDB computes the identical value), uniform, and independent of
    partitioning/row order. Changing ``salt`` draws a fresh assignment.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    return df.withColumn(
        "split",
        F.when(bucket < F.lit(train_pct), "train")
        .when(bucket < F.lit(train_pct + val_pct), "val")
        .otherwise("test"),
    )


def cap_per_source(
    df: DataFrame,
    source_col: str = "source",
    cap: int = 40,
    order_exprs=None,
    salt_col: str = "doc_id",
    num_salts: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per source, ranked by ``order_exprs``
    (default: ascending id; pass a unique final expression so selection is
    deterministic).

    Two-level skew-safe plan — the heavy sources are precisely the rows this
    operator exists to suppress, so a naive per-source window would put the
    hottest group on one partition:

      1. Count rows per source (map-side combine — only (source, count)
         pairs shuffle) and broadcast the over-cap source list.
      2. Under-cap sources pass through UNTOUCHED via a broadcast anti-join —
         no window, no shuffle of their rows (they are ≤ cap by count, so
         every row survives).
      3. Over-cap sources are pruned in two windows: first a salted local
         top-``cap`` per (source, salt-of-``salt_col``) — bounding any one
         window partition to ~rows/num_salts — then the global top-``cap``
         per source over the ≤ cap×num_salts survivors. Any global top-cap
         row is top-cap within its salt, so the composition is exact.

    Output rows are identical to the single-window plan; only the physical
    shape changes. NULL sources are one capped group (a window PARTITION BY
    groups nulls together, and missing-source docs are exactly the kind of
    mass this cap exists to bound) — the equi-joins below would silently
    pass every null row through the light branch, so grouping runs on a
    null-coalesced internal key.
    """
    if order_exprs is None:
        order_exprs = [F.col("doc_id")]
    keyed = df.withColumn(
        "_src_key",
        F.coalesce(F.col(source_col).cast("string"), F.lit("\x00<null-source>")),
    )
    counts = keyed.groupBy("_src_key").agg(F.count(F.lit(1)).alias("_n"))
    over = counts.where(F.col("_n") > cap).select("_src_key")
    light = keyed.join(F.broadcast(over), "_src_key", "left_anti")
    heavy = keyed.join(F.broadcast(over), "_src_key", "left_semi")
    w_local = Window.partitionBy(
        "_src_key", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(num_salts))
    ).orderBy(*order_exprs)
    w_global = Window.partitionBy("_src_key").orderBy(*order_exprs)
    capped = (
        heavy.withColumn("_lrn", F.row_number().over(w_local))
        .where(F.col("_lrn") <= cap)
        .withColumn("_grn", F.row_number().over(w_global))
        .where(F.col("_grn") <= cap)
        .drop("_lrn", "_grn")
    )
    return light.unionByName(capped).drop("_src_key")
