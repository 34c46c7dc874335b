"""Approximate seen-set pre-filter (north rule; SURVEY.md §4).

The reference's dedup is an in-memory MD5 set probe (extensions.go:289-305).
At 10^10-frontier scale the exact ``left_anti`` join against ``seen`` is
correct but shuffles every candidate; most crawl candidates are duplicates,
so a Bloom pre-filter eliminates the bulk before the join:

  * built **partition-locally**: ``mapPartitions`` over the seen table's
    url_hash column produces one bit-array per partition, OR-reduced to a
    global filter (Bloom filters are closed under union — the reason they
    are chosen over a cuckoo filter here, which would only add deletion
    support the crawl never needs);
  * broadcast to executors; candidates test membership in an Arrow-batched
    pandas UDF (pure numpy bit math);
  * ``maybe-seen`` survivors (true dups + fpr false positives) go through
    the exact anti-join as ground truth, so results are byte-identical to
    the exact path — the filter only prunes shuffle volume.

Each wave's filter increment is persisted alongside the wave snapshot so a
resumed crawl ORs the committed filters instead of rescanning ``seen``.
Spark's own runtime bloom-join (spark.sql.optimizer.runtime.bloomFilter) is
also enabled in session.py; this explicit layer exists because the seen
table outlives any single query and is reused across waves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

DEFAULT_NUM_BITS = 1 << 23  # 1 MiB of bits; ~0.1% fpr at 1M keys, k=5
NUM_HASHES = 5
_MASK = (1 << 64) - 1


def _indexes(h: np.ndarray, num_bits: int) -> list[np.ndarray]:
    """k deterministic bit indexes per 64-bit key (double hashing:
    idx_i = h1 + i*h2 mod m, Kirsch-Mitzenmacher)."""
    u = h.astype(np.uint64)
    h1 = (u ^ (u >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD) & np.uint64(_MASK)
    h2 = (h1 ^ (h1 >> np.uint64(29))) * np.uint64(0xC4CEB9FE1A85EC53) & np.uint64(_MASK)
    h2 = h2 | np.uint64(1)
    m = np.uint64(num_bits)
    return [((h1 + np.uint64(i) * h2) % m).astype(np.int64) for i in range(NUM_HASHES)]


def build_bloom(seen: DataFrame, num_bits: int = DEFAULT_NUM_BITS) -> np.ndarray:
    """Partition-local Bloom build over seen.url_hash, OR-reduced.

    Returns a packed uint8 bit array of length num_bits/8."""

    def part(rows):
        bits = np.zeros(num_bits // 8, dtype=np.uint8)
        hs = np.fromiter((r["url_hash"] for r in rows), dtype=np.int64)
        if len(hs):
            for idx in _indexes(hs, num_bits):
                np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        yield bits

    parts = seen.select("url_hash").rdd.mapPartitions(part).collect()
    out = np.zeros(num_bits // 8, dtype=np.uint8)
    for p in parts:
        np.bitwise_or(out, p, out=out)
    return out


def union_blooms(blooms: list[np.ndarray]) -> np.ndarray:
    out = np.zeros_like(blooms[0])
    for b in blooms:
        np.bitwise_or(out, b, out=out)
    return out


def maybe_seen_udf(spark, bloom: np.ndarray, num_bits: int = DEFAULT_NUM_BITS):
    """Arrow-batched membership test: True = maybe seen, False = definitely new."""
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf(BooleanType())
    def _udf(h: pd.Series) -> pd.Series:
        bits = bc.value
        hs = h.to_numpy(dtype=np.int64)
        hit = np.ones(len(hs), dtype=bool)
        for idx in _indexes(hs, num_bits):
            hit &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return pd.Series(hit)

    return _udf


def dedup_with_bloom(
    cand: DataFrame,
    seen: DataFrame,
    spark,
    bloom: np.ndarray | None,
    num_bits: int = DEFAULT_NUM_BITS,
) -> DataFrame:
    """Bloom-pruned exact dedup: definitely-new rows skip the anti-join;
    maybe-seen rows get the exact check. Output identical to a plain
    left_anti against seen."""
    if bloom is None:
        return cand.join(seen.select("url_hash"), on="url_hash", how="left_anti")
    udf = maybe_seen_udf(spark, bloom, num_bits)
    flagged = cand.withColumn("_maybe", udf(F.col("url_hash")))
    fresh = flagged.where(~F.col("_maybe")).drop("_maybe")
    suspect = (
        flagged.where(F.col("_maybe"))
        .drop("_maybe")
        .join(seen.select("url_hash"), on="url_hash", how="left_anti")
    )
    return fresh.unionByName(suspect)
