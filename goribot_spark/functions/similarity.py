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


# Default (table, bucket) size bound for embedding near-dup candidate
# generation. With 2^num_planes buckets per table the cap must sit WELL above
# the expected bucket size (N / 2^planes) — it exists to drop *degenerate*
# concentrations (zero/constant embeddings all hashing to one bucket), not to
# trim healthy buckets; deployments should scale num_planes with corpus size
# so expected bucket size stays bounded, and keep the cap ~one order above it.
EMB_BUCKET_CAP = 1024


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

    # Per-side norms computed once per row before the join (the aggregates
    # are interpreted HOFs — per-pair norms would triple the hot-loop work;
    # float-identical: each factor is the same expression either way).
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    e = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("ev")
    ).withColumn("en", _norm(F.col("ev")))
    j = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", _dot(F.col("qv"), F.col("ev")) / (F.col("qn") * F.col("en")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def _plane_signs(plane_idx: int, dim: int) -> list[float]:
    """±1 components of hyperplane ``plane_idx``: +1 iff the first hex byte
    of md5("<p>:<i>") is even — computed ONCE driver-side (config-scale:
    planes × dim md5 calls) and embedded as a literal array. The identical
    formula runs in the DuckDB oracle; the previous in-plan expression
    re-evaluated dim md5 calls per plane PER ROW (measured ~2.5x on the
    embedding near-dup bench)."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{plane_idx}:{i}".encode()).hexdigest()[:2], 16) % 2 == 0
        else -1.0
        for i in range(dim)
    ]


def _hyperplane_sign(vec, plane_idx: int, dim: int):
    """Sign of <v, h_p> with h_p the deterministic md5-parity hyperplane —
    a literal-array zip_with (whole-stage codegen, no per-row hashing).
    Oracle-checked against DuckDB's identical md5 math in __spark_entry__."""
    signs = F.array(*[F.lit(s) for s in _plane_signs(plane_idx, dim)])
    signed = F.zip_with(vec, signs, lambda x, s: x * s)
    return (F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x) > 0).cast("int")


def with_lsh_bucket(
    df: DataFrame, dim: int, num_planes: int = 8, vec_col: str = "embedding",
    table: int = 0,
) -> DataFrame:
    """Attach a ``bucket`` int: num_planes-bit random-hyperplane signature.
    Cosine-similar vectors collide with high probability (Charikar SimHash
    for real vectors). ``table`` selects an independent hyperplane set
    (table t uses plane indices t*num_planes .. t*num_planes+num_planes-1)
    for the banded OR-construction below."""
    # The cast vector is bound as a real column so the num_planes zip_with
    # evaluations share ONE cast per row instead of re-casting inline
    # (interpreted HOFs — no subexpression elimination).
    bound = df.select(*df.columns, as_double(F.col(vec_col)).alias("_v"))
    v = F.col("_v")
    bucket = F.lit(0)
    for p in range(num_planes):
        bucket = bucket * 2 + _hyperplane_sign(v, table * num_planes + p, dim)
    return bound.withColumn("bucket", bucket).drop("_v")


def with_lsh_tables(
    df: DataFrame,
    dim: int,
    num_planes: int = 4,
    vec_col: str = "embedding",
    num_tables: int = 2,
) -> DataFrame:
    """Explode each row into ``num_tables`` (table_id, bucket) entries, one
    per independent hyperplane table — the OR-construction: a pair is a
    candidate if it agrees on ALL planes of ANY table, so recall is
    1-(1-p^r)^b (tunable via num_tables/num_planes) instead of the single-
    table p^r cliff. Same banded shape as minhash LSH; buckets stay
    deterministic md5 math so a SQL oracle reproduces them."""
    # One bound cast per row shared by all num_tables*num_planes sign
    # evaluations (see with_lsh_bucket).
    bound = df.select(*df.columns, as_double(F.col(vec_col)).alias("_v"))
    v = F.col("_v")
    entries = []
    for t in range(num_tables):
        b = F.lit(0)
        for p in range(num_planes):
            b = b * 2 + _hyperplane_sign(v, t * num_planes + p, dim)
        entries.append(
            F.struct(F.lit(t).alias("table_id"), b.cast("long").alias("bucket"))
        )
    return bound.select(
        *df.columns, F.explode(F.array(*entries)).alias("_tb")
    ).select(*df.columns, "_tb.table_id", "_tb.bucket")


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: only compare vectors sharing an LSH bucket in at
    least one of ``num_tables`` independent hyperplane tables (banded
    OR-construction — recall 1-(1-p^r)^b, tunable; num_tables=1 is the
    classic single-table variant).

    The equi-join on (table, bucket) replaces the cross join — at scale this
    is a shuffle on a low-cardinality key with AQE skew handling; the query
    side broadcasts, candidate (query, neighbor) pairs are distinct'd before
    the exact sim so multi-table hits are scored once."""
    from pyspark.sql import Window

    e = with_lsh_tables(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev")),
        dim, num_planes, "ev", num_tables,
    )
    q = with_lsh_tables(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        dim, num_planes, "qv", num_tables,
    )
    cand = (
        e.select("neighbor_id", "table_id", "bucket")
        .join(F.broadcast(q.select("query_id", "table_id", "bucket")), ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    j = (
        cand.join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
                ).withColumn("qn", _norm(F.col("qv")))
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("ev")
            ).withColumn("en", _norm(F.col("ev"))),
            "neighbor_id",
        )
        .withColumn("sim", _dot(F.col("qv"), F.col("ev")) / (F.col("qn") * F.col("en")))
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
    lloyd_iters: int = 1,
    seed_salt: str = "seed",
) -> DataFrame:
    """IVF coarse quantizer: hash-sampled seed centroids refined by
    ``lloyd_iters`` Lloyd steps (assign every vector to its nearest centroid
    by cosine, then per-cluster component-wise mean). Clusters that lose all
    vectors keep their previous centroid. Fully deterministic — seeds are the
    ``num_centroids`` rows with the smallest md5("<salt>:<id>") (a uniform
    hash-sample over the corpus, NOT the lowest ids, so the seed set is
    unbiased at any scale yet still reproducible in a SQL oracle); no RNG, no
    collect of data-scale rows. Returns (centroid_id, centroid array<double>)
    where centroid_id is the seed row's id.

    At 10^10 rows each assignment is a broadcast nested-loop over C small
    centroids (O(N*C) scans, no shuffle of vectors); the Lloyd averaging
    shuffles only (cluster, pos, value) triples with map-side partial aggs.
    ``lloyd_iters`` is a config-scale loop — each iteration is one more
    broadcast-assign + triple-agg, no lineage growth beyond C-row frames.
    """
    # orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    # top-C followed by a C-row driver merge, never a single-partition sort
    # of the corpus.
    seeds = (
        emb.select(
            F.col(id_col).cast("long").alias("centroid_id"),
            as_double(F.col(vec_col)).alias("cv"),
            F.md5(
                F.concat_ws(":", F.lit(seed_salt), F.col(id_col).cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", "centroid_id")
        .limit(num_centroids)
        .drop("_h")
    )
    cents = seeds
    for _ in range(max(1, lloyd_iters)):
        assigned = _assign_to_centroids(
            emb, cents.select("centroid_id", F.col(cents.columns[1]).alias("cv")),
            id_col, vec_col,
        )
        # Component-wise mean per cluster: explode (cluster, pos, x),
        # partial-agg averages, re-pack sorted by pos. Only scalar triples
        # enter the shuffle.
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
        cents = cents.join(means, "centroid_id", "left").select(
            "centroid_id",
            F.coalesce("mv", F.col(cents.columns[1])).alias("centroid"),
        )
    return cents.select("centroid_id", "centroid")


def _assign_to_centroids(
    emb: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment by cosine (ties → lowest centroid_id):
    broadcast the (config-scale) centroid side, keep row 1 of a per-vector
    window. Returns (id, v, vn, centroid_id) — vn is the precomputed norm,
    reusable by callers scoring against v."""
    from pyspark.sql import Window

    e = emb.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("vn", _norm(F.col("v")))
    cents = cents.withColumn("cn", _norm(F.col("cv")))
    j = e.crossJoin(F.broadcast(cents)).withColumn(
        "csim", _dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("id", "v", "vn", "centroid_id")
    )


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 1,
) -> DataFrame:
    """IVF approximate top-k: vectors are bucketed into inverted lists by
    nearest refined centroid; each query scans only its nprobe nearest lists.

    The scan cost drops from O(N*Q) to O(N*Q*nprobe/C) in expectation; the
    only joins are a broadcast of the C-row centroid table and an equi-join
    on centroid_id (skew-bounded: list sizes concentrate around N/C, and AQE
    skew-join splits outliers). Returns (query_id, neighbor_id, rank, sim).
    """
    from pyspark.sql import Window

    cents = ivf_centroids(emb, num_centroids, id_col, vec_col, lloyd_iters)
    lists = _assign_to_centroids(emb, cents.select("centroid_id", F.col("centroid").alias("cv")), id_col, vec_col).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("ev"),
        F.col("vn").alias("en"),
        "centroid_id",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    qp = q.crossJoin(
        F.broadcast(
            cents.select("centroid_id", F.col("centroid").alias("cv")).withColumn(
                "cn", _norm(F.col("cv"))
            )
        )
    ).withColumn("csim", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qp.withColumn("_rn", F.row_number().over(wprobe))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", "centroid_id")
    )
    j = (
        lists.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", _dot(F.col("qv"), F.col("ev")) / (F.col("qn") * F.col("en")))
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
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 2,
    bucket_cap: int | None = EMB_BUCKET_CAP,
    chain_seg: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH +
    exact cosine verify. Candidates come from ``num_tables`` independent
    hyperplane tables (OR-construction — recall 1-(1-p^r)^b instead of the
    single-table p^r cliff); overfull (table, bucket) groups beyond
    ``bucket_cap`` degrade to linear star candidates against the bucket-min
    representative (dedup._split_buckets), so one hot bucket (e.g. a spike
    of zero/constant embeddings) can never go quadratic but an over-cap
    mass of true near-dups still reaches the verify stage. ``bucket_cap=
    None`` disables the cap (same convention as the dedup generators —
    useful for recall audits). Only (id, table, bucket) rows enter the
    candidate shuffle; vectors join back in for the exact verify. Returns
    (id_a, id_b, sim) with id_a < id_b."""
    from goribot_spark.functions.dedup import _split_buckets

    keyed = with_lsh_tables(
        emb.select(F.col(id_col).alias("id"), vec_col), dim, num_planes, vec_col,
        num_tables,
    ).select("id", "table_id", "bucket")
    seg = {} if chain_seg is None else {"chain_seg": chain_seg}
    keyed, stars = _split_buckets(keyed, ["table_id", "bucket"], bucket_cap, **seg)
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), ["table_id", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    if stars is not None:
        cand = cand.unionByName(stars)
    cand = cand.distinct()
    # Norms precomputed once per id, not once per pair: the dot/norm
    # aggregates are interpreted higher-order functions, and the verify
    # evaluates O(candidates) of them — per-pair norms tripled that work
    # (same float result: each factor is the identical expression).
    vecs = emb.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    return (
        cand.join(
            vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")),
            "id_a",
        )
        .join(
            vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")),
            "id_b",
        )
        .withColumn("sim", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
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
