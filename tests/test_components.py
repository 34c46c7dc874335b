"""Connected components over near-dup pairs (dedup.connected_components).

The reference has no clustering step (its dedup is per-request hashing,
tools.go:22-78); this operator is part of the training-data-pipeline
surface: LSH emits pairs, the pipeline needs transitive clusters with a
canonical doc per cluster. Expected values come from a plain union-find
over the same edge list, so the test is parity against the textbook
definition, not hand-picked outputs.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from goribot_spark.functions.dedup import (
    connected_components,
    dedup_component_summary,
    lsh_candidate_pairs,
    ngram_jaccard,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id per component
    comp = {}
    for n in parent:
        root = find(n)
        comp[n] = root
    # path compression above makes find(root) the min only if unions always
    # attach the larger root under the smaller — they do (max under min).
    return comp


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_chain_and_island(spark):
    # transitive closure: (1,2),(2,3),(3,4) is ONE cluster even though
    # (1,4) was never emitted; (10,11) stays separate.
    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_path_needs_multiple_rounds(spark):
    # a 64-node path with shuffled ids: diameter 63, so plain one-hop label
    # propagation would need 63 rounds; star contraction converges within
    # the max_iter bound and must still be exact.
    rng = random.Random(7)
    ids = list(range(100, 164))
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    assert _run(spark, edges) == {i: 100 for i in ids}


def test_parity_with_union_find_random_graph(spark):
    rng = random.Random(42)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    expect = _union_find(edges)
    assert _run(spark, edges) == expect


def test_components_on_real_lsh_pairs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = lsh_candidate_pairs(docs, num_hashes=16, bands=4, shingle_n=3)
    verified = ngram_jaccard(docs, pairs).where(F.col("jaccard") >= 0.5)
    edge_rows = [(r["id_a"], r["id_b"]) for r in verified.collect()]
    expect = _union_find(edge_rows)
    comp = connected_components(verified)
    got = {r["node"]: r["comp"] for r in comp.collect()}
    assert got == expect
    # summary: component sizes match the union-find grouping
    sizes = {}
    for n, c in expect.items():
        sizes[c] = sizes.get(c, 0) + 1
    summary = {
        r["component_id"]: r["n_docs"]
        for r in dedup_component_summary(comp).collect()
    }
    assert summary == {c: n for c, n in sizes.items() if n > 1}


def test_driver_and_distributed_paths_agree(spark):
    """The size-adaptive driver union-find (default for small edge lists)
    and the star-contraction (forced via driver_max_edges=0) must label
    identically — same graphs as the parity test plus a long path."""
    rng = random.Random(99)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
    edges = [e for e in edges if e[0] != e[1]]
    expect = _union_find(edges)
    assert _run(spark, edges) == expect                        # driver path
    assert _run(spark, edges, driver_max_edges=0) == expect    # distributed
    ids = list(range(500, 564))
    rng.shuffle(ids)
    path = list(zip(ids, ids[1:]))
    assert _run(spark, path) == {i: 500 for i in ids}
    assert _run(spark, path, driver_max_edges=0) == {i: 500 for i in ids}
