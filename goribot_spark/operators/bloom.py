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


# -- bucket-sharded variant (the 10^10 path) --------------------------------
#
# A single filter sized for 10^10 seen keys (~12 GiB at 1% fpr) can neither
# be collect()ed to the driver nor broadcast. The sharded path removes both
# driver-side steps:
#   * build: seen is hash-repartitioned by shard = pmod(url_hash, n_shards);
#     each shard's bitmap is built inside its partition and emitted as ONE
#     (shard, bits) row into a parquet table next to the seen waves — the
#     driver never touches a bitmap;
#   * probe: candidates are cogrouped with the shard table on the same
#     shard key, so each task materializes ONLY its shard's filter (OR of
#     that shard's per-wave increments) — no monolithic broadcast, total
#     filter memory is spread 1/n_shards per task;
#   * maybe-seen survivors still go through the exact anti-join, so output
#     is byte-identical to the exact path (same contract as the single-
#     bitmap variant).
# The reference's distributed dedup is a remote shared set (manager.go:
# 182-193); this is its filter-accelerated Spark shape at frontier scale.

DEFAULT_NUM_SHARDS = 16


def shard_of(col, n_shards: int):
    """Shard key — F.pmod is non-negative for negative hashes, and the
    probe side MUST use the same expression (JVM-evaluated both times)."""
    return F.pmod(col, F.lit(n_shards)).cast("int")


def build_bloom_shards(
    seen: DataFrame, n_shards: int = DEFAULT_NUM_SHARDS, shard_bits: int = DEFAULT_NUM_BITS // DEFAULT_NUM_SHARDS
) -> DataFrame:
    """Partition-local sharded build over seen.url_hash → (shard, bits)
    DataFrame, one row per non-empty shard. The repartition puts each
    shard wholly inside one partition, so no reduce step (and no driver
    union) is needed — the mapInPandas accumulates across its partition's
    Arrow batches and emits each shard's finished bitmap once."""
    if shard_bits % 8:
        raise ValueError("shard_bits must be a multiple of 8")

    def part(batches):
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            hs = pdf["url_hash"].to_numpy(dtype=np.int64)
            sh = pdf["_shard"].to_numpy()
            for s in np.unique(sh):
                bits = acc.setdefault(int(s), np.zeros(shard_bits // 8, dtype=np.uint8))
                hsel = hs[sh == s]
                for idx in _indexes(hsel, shard_bits):
                    np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        if acc:
            yield pd.DataFrame(
                {
                    "shard": list(acc.keys()),
                    "bits": [a.tobytes() for a in acc.values()],
                }
            )

    return (
        seen.select("url_hash", shard_of(F.col("url_hash"), n_shards).alias("_shard"))
        .repartition(n_shards, "_shard")
        .mapInPandas(part, "shard int, bits binary")
    )


def flag_with_bloom_shards(
    cand: DataFrame,
    shards: DataFrame,
    n_shards: int = DEFAULT_NUM_SHARDS,
    shard_bits: int = DEFAULT_NUM_BITS // DEFAULT_NUM_SHARDS,
) -> DataFrame:
    """The probe alone: cand plus a ``_maybe`` flag — True if the shard's
    filter says maybe-seen (exact anti-join still required), False if
    definitely new. Split out of dedup_with_bloom_shards so diagnostics
    (scripts/bloom_bench.py) can count the reduction the filter buys."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    c = cand.withColumn("_shard", shard_of(F.col("url_hash"), n_shards))
    out_schema = StructType(
        list(c.schema.fields) + [StructField("_maybe", BooleanType(), False)]
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return left.assign(_maybe=np.zeros(0, dtype=bool))
        hs = left["url_hash"].to_numpy(dtype=np.int64)
        if not len(right):
            return left.assign(_maybe=np.zeros(len(hs), dtype=bool))
        bits = np.zeros(shard_bits // 8, dtype=np.uint8)
        for b in right["bits"]:
            np.bitwise_or(bits, np.frombuffer(b, dtype=np.uint8), out=bits)
        maybe = np.ones(len(hs), dtype=bool)
        for idx in _indexes(hs, shard_bits):
            maybe &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return left.assign(_maybe=maybe)

    return (
        c.groupBy("_shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(probe, out_schema)
        .drop("_shard")
    )


def dedup_with_bloom_shards(
    cand: DataFrame,
    seen: DataFrame,
    shards: DataFrame,
    n_shards: int = DEFAULT_NUM_SHARDS,
    shard_bits: int = DEFAULT_NUM_BITS // DEFAULT_NUM_SHARDS,
) -> DataFrame:
    """Sharded Bloom-pruned exact dedup — output identical to a plain
    left_anti against seen. ``shards`` is the (shard, bits) table (several
    rows per shard across wave increments are OR-ed inside the probe task).
    A shard absent from the table holds no seen keys, so its candidates are
    definitely new."""
    flagged = flag_with_bloom_shards(cand, shards, n_shards, shard_bits)
    fresh = flagged.where(~F.col("_maybe")).drop("_maybe")
    suspect = (
        flagged.where(F.col("_maybe"))
        .drop("_maybe")
        .join(seen.select("url_hash"), on="url_hash", how="left_anti")
    )
    return fresh.unionByName(suspect)


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
