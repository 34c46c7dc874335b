"""Text-analysis operators: the corpus oracles cover the fixed test corpus
(which happens to contain no digits), so the BPE-ish sub-word counter's
boundary-splitting behavior is pinned here on inputs where it actually
diverges from the whitespace count."""

from pyspark.sql import functions as F

from goribot_spark.functions.text import bpe_ish_token_count, token_count


def test_bpe_ish_diverges_on_letter_digit_boundaries(spark):
    rows = [
        (1, "AB12cd x9 hello"),  # ab|12|cd + x|9 + hello = 6 pieces, 3 words
        (2, "plain words only"),  # no boundaries: equals whitespace count
        (3, ""),  # empty → 0/0
        (4, "a1b"),  # adjacent transitions: a|1|b
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["ws"], r["bpe"])
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("ws"),
            bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert got[1] == (3, 6)
    assert got[2] == (3, 3)
    assert got[3] == (0, 0)
    assert got[4] == (1, 3)
