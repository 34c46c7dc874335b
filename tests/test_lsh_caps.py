"""LSH bucket caps + degenerate-key exclusion — the 100 TB skew hazards.

Every LSH candidate generator (minhash bands, simhash bands, embedding
hyperplane buckets) must (a) exclude the degenerate keys that concentrate
pathological mass into one bucket by construction (all-null minhash
signatures of <n-token docs, simhash 0 of empty docs), and (b) drop buckets
whose membership exceeds the cap via a broadcast anti-join, so a corpus with
millions of empty/boilerplate rows can never make the self-join quadratic.
These tests build exactly that corpus shape at sandbox scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from goribot_spark.functions.dedup import (
    LSH_BUCKET_CAP,
    lsh_candidate_pairs,
    minhash_near_dups,
    simhash_near_dups,
)
from goribot_spark.functions.similarity import (
    embedding_near_dups,
    embedding_near_dups_exact,
)

SF_DIR = "/root/testdata/sf0.001"


def _degenerate_corpus(spark, n_empty=4000, n_short=4000, n_boiler=2000, n_real=40):
    """Empty docs, <3-token docs (null minhash sig), one 2000-doc verbatim
    boilerplate mass (a single over-cap bucket), and a handful of genuine
    near-dup docs that must still be found."""
    rows = []
    i = 0
    for _ in range(n_empty):
        rows.append((i, ""))
        i += 1
    for _ in range(n_short):
        rows.append((i, "hi there"))
        i += 1
    boiler = "terms of service apply to all users of this site please read carefully"
    for _ in range(n_boiler):
        rows.append((i, boiler))
        i += 1
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    for k in range(n_real):
        # verbatim-duplicate pairs (k//2 groups of 2) → Jaccard 1, hamming 0
        rows.append((i, base + f" v{k // 2}"))
        i += 1
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )


def test_minhash_degenerate_buckets_capped(spark):
    d = _degenerate_corpus(spark)
    pairs = lsh_candidate_pairs(d, num_hashes=16, bands=4, shingle_n=3).collect()
    ids = {p for r in pairs for p in (r["id_a"], r["id_b"])}
    # no pair may involve an empty/short doc (null signature → excluded) or
    # the boilerplate mass (one bucket of 2000 ≫ cap → dropped whole)
    assert all(p >= 10_000 for p in ids), f"degenerate ids in pairs: {sorted(ids)[:5]}"
    # the genuine near-dups (under-cap buckets) are still found
    assert len(pairs) >= 15
    verified = minhash_near_dups(d, threshold=0.5).collect()
    assert all(r["id_a"] >= 10_000 and r["id_b"] >= 10_000 for r in verified)
    assert len(verified) >= 15


def test_simhash_degenerate_buckets_capped(spark):
    d = _degenerate_corpus(spark)
    pairs = simhash_near_dups(d, max_hamming=3).collect()
    ids = {p for r in pairs for p in (r["id_a"], r["id_b"])}
    # empty docs (simhash 0) excluded; boilerplate mass (2000 identical
    # simhashes → one over-cap bucket per band) dropped whole
    assert all(p >= 10_000 for p in ids), f"degenerate ids in pairs: {sorted(ids)[:5]}"
    assert len(pairs) >= 15  # near-identical real docs collide within hamming<=3


def test_minhash_small_dup_groups_survive_cap(spark):
    """A duplicate group smaller than the cap is NOT dropped."""
    docs = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(10)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = lsh_candidate_pairs(d).collect()
    assert len(pairs) == 45  # all C(10,2) verbatim-dup pairs
    assert LSH_BUCKET_CAP >= 10


def test_embedding_bucket_cap_drops_degenerate(spark):
    """500 identical embeddings (one bucket in EVERY table) vanish under a
    cap of 64; a small genuine near-dup pair in a healthy bucket survives."""
    rows = [(i, [1.0] + [0.0] * 7) for i in range(500)]
    rows += [(1000, [0.1, 0.9, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0]),
             (1001, [0.1, 0.88, 0.22, 0.0, 0.0, 0.0, 0.0, 0.0])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_near_dups(
        e, dim=8, threshold=0.9, num_planes=2, num_tables=2, bucket_cap=64
    ).collect()
    ids = {p for r in out for p in (r["id_a"], r["id_b"])}
    assert ids <= {1000, 1001}
    assert (1000, 1001) in {(r["id_a"], r["id_b"]) for r in out}


def test_embedding_lsh_recall_floor(spark):
    """Banded OR-construction recall audit: with 2 independent hyperplane
    tables the candidate set must cover >=70% of the exact near-dup pairs on
    the fixture corpus (the single-table variant measured 0.43 — the recall
    cliff the banding exists to fix), and adding a table never loses pairs."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups_exact(e, threshold=0.45).collect()
    }
    assert exact, "fixture corpus must contain exact near-dup pairs"
    one = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            e, dim=64, threshold=0.45, num_planes=4, num_tables=1, bucket_cap=1024
        ).collect()
    }
    two = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            e, dim=64, threshold=0.45, num_planes=4, num_tables=2, bucket_cap=1024
        ).collect()
    }
    assert one <= two  # OR-construction only adds candidates
    recall = len(two & exact) / len(exact)
    assert recall >= 0.7, f"2-table recall {recall:.2f} below floor"
    assert len(two & exact) > len(one & exact) or len(one & exact) == len(exact)


def test_phash_near_dups_images(spark):
    """Image-payload near-dup: banded hamming join over the phash column
    (input_hint schema). Perturbed copies of an image land within the
    hamming radius; blank images (phash 0) are excluded; a degenerate mass
    of identical hashes is capped away; unrelated hashes don't pair."""
    import numpy as np

    from goribot_spark.functions.dedup import phash_near_dups
    from goribot_spark.functions.pngcodec import phash64

    yy, xx = np.mgrid[0:32, 0:32]
    base = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    img = np.stack([base, base, base], axis=2)
    noisy = img.copy()
    noisy[:2, :2, :] = 255  # tiny corner perturbation
    h0, h1 = phash64(img), phash64(noisy)
    assert bin(h0 ^ h1).count("1") <= 3  # pngcodec locality holds

    rows = [("a0", h0), ("a1", h1)]
    rows += [(f"blank{i}", 0) for i in range(200)]          # degenerate zeros
    rows += [(f"mass{i}", 0x1234_5678_9ABC_DEF0) for i in range(200)]  # over-cap
    rows += [(f"far{i}", (0x0F0F_0F0F << i) & 0x7FFF_FFFF_FFFF_FFFF) for i in range(8)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = phash_near_dups(df, max_hamming=3, bucket_cap=64).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("a0", "a1") in got
    assert all(not a.startswith(("blank", "mass")) for p in got for a in p)
