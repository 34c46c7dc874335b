"""Text-analysis operators for large-scale corpus pipelines.

Beyond the reference's crawl surface: language-ID, quality scoring, token
counting, and document fingerprinting over a ``documents(text)`` table — the
post-crawl processing a training-data pipeline runs on fetched captions/pages.
All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen); formulas are deliberately ANSI-SQL-expressible so every
operator has a DuckDB oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lists for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "los", "de", "que", "es"],
    "zh": ["的", "是", "了", "在", "和"],
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(col) -> Column:
    """Whitespace tokenization of lowercased text (empty text → empty array)."""
    c = F.lower(F.trim(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token estimate: whitespace tokens split further at
    letter<->digit boundaries (a cheap BPE stand-in — 'ab12cd' counts as 3
    pieces). Two global regex replaces insert a space at each boundary,
    then whitespace-count; deliberately lookaround-free so the identical
    formula runs in the DuckDB oracle (RE2 has no lookbehind)."""
    c = F.lower(F.trim(col))
    c = F.regexp_replace(c, "([a-z])([0-9])", "$1 $2")
    c = F.regexp_replace(c, "([0-9])([a-z])", "$1 $2")
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))


def fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Same formula as the DuckDB oracle."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def punct_ratio(col) -> Column:
    """Fraction of characters that are not alnum/whitespace."""
    total = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(col) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: rewards medium length and prose-like
    stopword density, penalizes punctuation noise. Deterministic, SQL-parity."""
    n = token_count(col)
    len_score = F.least(n / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4.0)
    return F.round((len_score + stop_score + punct_pen) / 3.0, 4)


def lang_scores(col) -> dict[str, Column]:
    """Marker-hit counts per language (distinct-token hits, order-free)."""
    toks = F.array_distinct(tokens(col))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col) -> Column:
    """Argmax language with deterministic tie-break (alphabetical language
    code order, 'und' if no marker hits)."""
    scores = lang_scores(col)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in sorted(scores):  # later wins only on strict improvement
        s = scores[lang]
        improved = s > best_n
        best = F.when(improved, F.lit(lang)).otherwise(best)
        best_n = F.when(improved, s).otherwise(best_n)
    return best


def shingles_from_tokens(toks, n: int = 3) -> Column:
    """Word n-gram shingles from a BOUND token-array column (empty when
    < n tokens). ``toks`` must be a real projected column, not an inline
    ``tokens(text)`` expression: higher-order lambdas are interpreted
    (CodegenFallback, no subexpression elimination), so any expression in
    the lambda body re-evaluates PER ELEMENT — an inlined split() would
    re-tokenize the whole document once per shingle, O(tokens²) per doc
    (measured 5-8s for 5k sf0.1 docs vs <1s bound). Callers project the
    token array in a separate select; Catalyst keeps that projection
    because the non-cheap split is referenced more than once here."""
    k = F.size(toks)
    return F.when(k < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def word_shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles of raw text — CONVENIENCE form for small/test
    frames. In hot paths use ``shingles_from_tokens`` over a separately
    projected token column (see its docstring for the O(tokens²) hazard)."""
    return shingles_from_tokens(tokens(col), n)


def md5_long(col) -> Column:
    """First 15 hex digits of md5 as a BIGINT — identical in DuckDB via
    ('0x'||substr(md5(x),1,15))::BIGINT. The portable hash for minhash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("quality", quality_score(c))
        .withColumn("fp", fingerprint(c))
    )
