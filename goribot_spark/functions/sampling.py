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
) -> DataFrame:
    """Keep at most ``cap`` rows per source, ranked by ``order_exprs``
    (default: ascending id). Pass a unique final expression so selection
    is deterministic.

    One shuffle on the source key; at 100 TB the heavy-source groups this
    exists to suppress are exactly the window's skew risk, so rank with
    the 2-level trick if a single source exceeds executor memory — at
    that point the cheaper plan is a pre-filter: count per source
    (map-side combine), broadcast the over-cap source list, and only
    window those. Documented rather than implemented: the cap output is
    ≤ cap × n_sources rows either way.
    """
    if order_exprs is None:
        order_exprs = [F.col("doc_id")]
    w = Window.partitionBy(source_col).orderBy(*order_exprs)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .drop("rn")
    )
