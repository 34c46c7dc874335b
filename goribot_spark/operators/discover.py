"""Link discovery → candidate frontier rows (P2-P4, goribot.go:163-172).

posexplode the parsed link arrays, resolve relative URLs against the parent
response URL (goribot.go:163-166 → urljoin in a pandas UDF), assign child
depth = parent + 1 (goribot.go:166-168), carry the parent URL as Referer
(RefererFiller, extensions.go:250-259), propagate meta/handler/priority, and
stamp deterministic ordering keys (discovery_epoch = wave, seq = rank by
(parent seq, link position)) that replace queue position (scheduler.go:60-68).
"""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from goribot_spark.canon import with_url_hash
from goribot_spark.operators.ordering import with_global_rank


@F.pandas_udf(StringType())
def resolve_url_udf(parent: pd.Series, link: pd.Series) -> pd.Series:
    def _resolve(p, l):
        if l is None:
            return None
        try:
            return urljoin(p, l)
        except ValueError:
            return None

    return pd.Series([_resolve(p, l) for p, l in zip(parent, link)])


def host_of(url_col) -> "F.Column":
    """Lowercased hostname — JVM-side (parse_url in whole-stage codegen; the
    previous pandas-UDF variant was a per-wave Python crossing for work a
    builtin does). Empty string where no host parses, matching
    urlsplit().hostname or ''."""
    return F.coalesce(F.lower(F.parse_url(url_col, F.lit("HOST"))), F.lit(""))


def build_candidates(
    fetched: DataFrame,
    wave: int,
    seq_base: int,
    cache_registry: list | None = None,
    small_wave: bool = False,
):
    """Fetched+parsed wave → FRONTIER-schema candidate rows (pre-admission).

    Returns (candidates_df, n_candidates); seq values occupy
    [seq_base, seq_base + n_candidates). ``small_wave`` flips the ranking to
    the single-partition fast path (same deterministic seq values)."""
    # Children inherit user meta but NOT the parent's request shape: a
    # discovered link is a fresh GET in the reference (ctx.AddTask(Get(u)),
    # goribot.go:163-172 — no header/cookie/body inheritance), so the
    # request-shaping keys (canon.py: h:/c:/body/method) are stripped and
    # the child's frontier key is the plain canonical-URL hash. An OnAdd
    # hook that sets h:/c: keys must also recompute url_hash via
    # canon.with_url_hash(meta_col="meta").
    child_meta = F.map_filter(
        F.col("meta"),
        lambda k, v: ~k.startswith("h:")
        & ~k.startswith("c:")
        & (k != "body")
        & (k != "method"),
    )
    # Resolution base: the post-redirect URL when the fetch leg recorded one
    # (live mode's final_url) — goribot.go:163-166 resolves against
    # resp.Request.URL, which net/http rewrites per redirect hop. The
    # frontier/dedup/retry key stays the REQUESTED url (unchanged columns).
    base_url = (
        F.coalesce(F.col("final_url"), F.col("url"))
        if "final_url" in fetched.columns
        else F.col("url")
    )
    exploded = fetched.select(
        base_url.alias("parent_url"),
        F.col("depth").alias("parent_depth"),
        F.col("priority").alias("parent_priority"),
        F.col("seq").alias("parent_seq"),
        F.col("handler_id"),
        child_meta.alias("meta"),
        F.posexplode_outer("links").alias("link_pos", "raw_link"),
    ).where(F.col("raw_link").isNotNull())

    resolved = exploded.withColumn(
        "url", resolve_url_udf(F.col("parent_url"), F.col("raw_link"))
    ).where(F.col("url").isNotNull() & F.col("url").startswith("http"))

    resolved = with_url_hash(resolved, "url", "url_hash").withColumn(
        "host", host_of(F.col("url"))
    )

    ranked, total = with_global_rank(
        resolved,
        [F.col("parent_seq").asc(), F.col("link_pos").asc()],
        out_col="seq",
        base=seq_base,
        return_total=True,
        cache_registry=cache_registry,
        single_partition=small_wave,
    )
    return ranked.select(
        "url",
        "url_hash",
        "host",
        (F.col("parent_depth") + 1).cast("int").alias("depth"),
        F.col("parent_priority").alias("priority"),
        F.lit(wave).cast("int").alias("discovery_epoch"),
        "seq",
        F.lit(0).cast("int").alias("retry_count"),
        F.col("parent_url").alias("referer"),
        "handler_id",
        "meta",
    ), total
