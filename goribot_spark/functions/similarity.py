"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (pure built-ins: zip_with dot
product, JVM-side, broadcast query side), and an LSH-bucketed approximate
variant as the scale path: at 10^10 rows the brute-force cross join is
O(N·Q); random-hyperplane bucketing reduces the candidate set to matching
buckets, shuffling only (bucket, id) pairs. Hyperplanes are derived
deterministically from md5 — reproducible without driver-side RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query side, dot
    products in whole-stage codegen, per-query top-k via window row_number.
    Ties broken by ascending neighbor id — fully deterministic.

    Returns (query_id, neighbor_id, rank, sim) with sim rounded to 4 dp.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    e = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("ev")
    )
    j = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", _dot(F.col("qv"), F.col("ev")) / (_norm("qv") * _norm("ev")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def _hyperplane_sign(vec, plane_idx: int, dim: int):
    """Sign of <v, h_p> with h_p[i] = ±1 derived from md5(p:i) parity —
    deterministic pseudo-random hyperplanes, no RNG state, no data movement.

    NB: the transform lambda must take exactly ONE parameter — PySpark passes
    (element, index) to two-parameter lambdas, so a ``p=plane_idx`` default
    would silently bind ``p`` to the index Column (a bug this fixed: the
    hyperplanes were stringified Column reprs, unstable across plans).
    Oracle-checked against DuckDB's identical md5 math in __spark_entry__."""
    prefix = f"{plane_idx}:"
    signed = F.zip_with(
        vec,
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(prefix), i.cast("string"))), 1, 2),
                    16,
                    10,
                ).cast("int")
                % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        ),
        lambda x, s: x * s,
    )
    return (F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x) > 0).cast("int")


def with_lsh_bucket(
    df: DataFrame, dim: int, num_planes: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Attach a ``bucket`` int: num_planes-bit random-hyperplane signature.
    Cosine-similar vectors collide with high probability (Charikar SimHash
    for real vectors)."""
    v = as_double(F.col(vec_col))
    bucket = F.lit(0)
    for p in range(num_planes):
        bucket = bucket * 2 + _hyperplane_sign(v, p, dim)
    return df.withColumn("bucket", bucket)


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only compare vectors sharing an LSH bucket.

    The equi-join on ``bucket`` replaces the cross join — at scale this is a
    shuffle on a low-cardinality key with AQE skew handling; recall is tuned
    by num_planes (fewer planes → bigger buckets → higher recall)."""
    from pyspark.sql import Window

    e = with_lsh_bucket(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev")),
        dim,
        num_planes,
        "ev",
    )
    q = with_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        dim,
        num_planes,
        "qv",
    )
    j = (
        e.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            _dot(as_double(F.col("qv")), as_double(F.col("ev")))
            / (_norm(as_double(F.col("qv"))) * _norm(as_double(F.col("ev")))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def ivf_centroids(
    emb: DataFrame,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: deterministic seed centroids (the num_centroids
    smallest ids) refined by ONE Lloyd step (assign every vector to its
    nearest seed by cosine, then per-cluster component-wise mean). Seeds with
    no assigned vectors keep their seed vector. Fully deterministic — no RNG,
    no collect of data-scale rows — so the DuckDB oracle reproduces the exact
    centroid table. Returns (centroid_id, centroid array<double>).

    At 10^10 rows the assignment is a broadcast nested-loop over C small
    centroids (O(N*C) scans, no shuffle of vectors); the Lloyd averaging
    shuffles only (cluster, pos, value) triples with map-side partial aggs.
    """
    seeds = emb.where(F.col(id_col) < num_centroids).select(
        F.col(id_col).cast("long").alias("centroid_id"),
        as_double(F.col(vec_col)).alias("cv"),
    )
    assigned = _assign_to_centroids(emb, seeds, id_col, vec_col)
    # Component-wise mean per cluster: explode (cluster, pos, x), partial-agg
    # averages, re-pack sorted by pos. Only scalar triples enter the shuffle.
    means = (
        assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
        .groupBy("centroid_id", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("centroid_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("mv")
        )
    )
    return seeds.join(means, "centroid_id", "left").select(
        "centroid_id", F.coalesce("mv", "cv").alias("centroid")
    )


def _assign_to_centroids(
    emb: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment by cosine (ties → lowest centroid_id):
    broadcast the (config-scale) centroid side, keep row 1 of a per-vector
    window. Returns (id, v, centroid_id)."""
    from pyspark.sql import Window

    e = emb.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    j = e.crossJoin(F.broadcast(cents)).withColumn(
        "csim", _dot(F.col("v"), F.col("cv")) / (_norm("v") * _norm("cv"))
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("id", "v", "centroid_id")
    )


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: vectors are bucketed into inverted lists by
    nearest refined centroid; each query scans only its nprobe nearest lists.

    The scan cost drops from O(N*Q) to O(N*Q*nprobe/C) in expectation; the
    only joins are a broadcast of the C-row centroid table and an equi-join
    on centroid_id (skew-bounded: list sizes concentrate around N/C, and AQE
    skew-join splits outliers). Returns (query_id, neighbor_id, rank, sim).
    """
    from pyspark.sql import Window

    cents = ivf_centroids(emb, num_centroids, id_col, vec_col)
    lists = _assign_to_centroids(emb, cents.select("centroid_id", F.col("centroid").alias("cv")), id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("ev"), "centroid_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    qp = q.crossJoin(
        F.broadcast(cents.select("centroid_id", F.col("centroid").alias("cv")))
    ).withColumn("csim", _dot(F.col("qv"), F.col("cv")) / (_norm("qv") * _norm("cv")))
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qp.withColumn("_rn", F.row_number().over(wprobe))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    j = (
        lists.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", _dot(F.col("qv"), F.col("ev")) / (_norm("qv") * _norm("ev")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def embedding_near_dups(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing + exact cosine
    verify within buckets. Returns (id_a, id_b, sim) with id_a < id_b."""
    b = with_lsh_bucket(emb.select(id_col, vec_col), dim, num_planes, vec_col)
    a = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("bucket")
    )
    c = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("bucket")
    )
    return (
        a.join(c, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            _dot(as_double(F.col("va")), as_double(F.col("vb")))
            / (_norm(as_double(F.col("va"))) * _norm(as_double(F.col("vb")))),
        )
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


def embedding_near_dups_exact(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: all-pairs self-join with
    cosine >= threshold. O(N^2) — the correctness baseline the LSH variant
    (``embedding_near_dups``) is verified against; at corpus scale use the
    LSH path and keep this for sampled recall audits.

    Returns (id_a, id_b, sim) with id_a < id_b, sim rounded to 4 dp."""
    n = emb.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    a = n.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = n.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )
