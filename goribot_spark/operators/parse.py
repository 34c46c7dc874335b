"""Fetch-payload decode + parse stage (reference net.go:191-228, S6-S9).

One Arrow-vectorized pandas UDF handles, per batch: transparent gunzip
(net.go:296-303), charset decode (net.go:199-206 — declared charset honored,
else a deterministic detector: BOM / <meta charset> sniff / strict-UTF-8 →
GBK fallback, standing in for chardet), HTML link/img/title extraction (net.go:219-225's goquery DOM →
stdlib HTMLParser here), and JSON field extraction (net.go:231-233's gjson →
``json`` module). No DOM object crosses stages: the UDF returns a struct
column ``(links, image_refs, title, parse_error)``.
"""

from __future__ import annotations

import gzip
import json
import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

PARSED = StructType(
    [
        StructField("links", ArrayType(StringType()), True),
        StructField("image_refs", ArrayType(StringType()), True),
        # alt text aligned 1:1 with image_refs (caption source for live
        # crawls, where no images-table join exists to provide captions)
        StructField("image_alts", ArrayType(StringType()), True),
        StructField("title", StringType(), True),
        StructField("parse_error", StringType(), True),
    ]
)

_CHARSET_RE = re.compile(r"charset=([\w\-]+)", re.I)
_META_CHARSET_RE = re.compile(rb"<meta[^>]+charset=[\"']?([\w\-]+)", re.I)


def _decode_text(body: bytes, ctype: str, forced: str | None = None) -> str:
    """Charset resolution mirroring net.go:199-206 (forced encoding, else
    chardet auto-detection) with a deterministic detector: FORCED charset
    (Request.ResponseCharacterEncoding, net.go:94 — honored ahead of
    everything at net.go:199-201; carried as the ``charset`` meta key here)
    → declared charset → BOM → <meta charset> sniff in the first 1 KiB →
    strict-UTF-8 try → GBK try → permissive UTF-8. Covers the reference's
    own detection test corpus (GBK pages without a charset declaration,
    net_test.go:82-92) without a chardet dependency."""
    if forced:
        try:
            return body.decode(forced, errors="replace")
        except LookupError:
            pass  # unknown codec name → fall through to the detector
    m = _CHARSET_RE.search(ctype)
    if m:
        return body.decode(m.group(1), errors="replace")
    if body.startswith(b"\xef\xbb\xbf"):
        return body.decode("utf-8-sig", errors="replace")
    if body.startswith(b"\xff\xfe"):
        return body.decode("utf-16-le", errors="replace")
    if body.startswith(b"\xfe\xff"):
        return body.decode("utf-16-be", errors="replace")
    m = _META_CHARSET_RE.search(body[:1024])
    if m:
        try:
            return body.decode(m.group(1).decode("ascii"), errors="replace")
        except LookupError:
            pass
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        try:
            return body.decode("gbk")
        except UnicodeDecodeError:
            return body.decode("utf-8", errors="replace")


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__()
        self.links: list[str] = []
        self.images: list[str] = []
        self.alts: list[str | None] = []
        self.title_parts: list[str] = []
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "a" and d.get("href"):
            self.links.append(d["href"])
        elif tag == "img" and d.get("src"):
            src = d["src"]
            self.images.append(src[6:] if src.startswith("img://") else src)
            self.alts.append(d.get("alt"))
        elif tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)


def _parse_one(body: bytes | None, content_type: str | None, forced: str | None = None):
    if body is None:
        return None, None, None, None, "empty_body"
    try:
        if body[:2] == b"\x1f\x8b":
            body = gzip.decompress(body)
        ctype = content_type or ""
        if "json" in ctype:
            doc = json.loads(body.decode("utf-8"))
            imgs = list(doc.get("images", []))
            return (
                list(doc.get("links", [])),
                imgs,
                [None] * len(imgs),
                doc.get("title"),
                None,
            )
        if "html" in ctype or ctype.startswith("text/"):
            text = _decode_text(body, ctype, forced)
            ex = _Extractor()
            ex.feed(text)
            return ex.links, ex.images, ex.alts, "".join(ex.title_parts), None
        # opaque payload: no parse (net.go:196-197)
        return [], [], [], None, None
    except Exception as e:  # R3 panic recovery: never fail the job
        return None, None, None, None, f"parse_error:{type(e).__name__}:{e}"


@F.pandas_udf(PARSED)
def parse_body_udf(
    body: pd.Series, content_type: pd.Series, forced_charset: pd.Series
) -> pd.DataFrame:
    out = {"links": [], "image_refs": [], "image_alts": [], "title": [], "parse_error": []}
    for b, ct, fc in zip(body, content_type, forced_charset):
        links, imgs, alts, title, err = _parse_one(b, ct, fc)
        out["links"].append(links)
        out["image_refs"].append(imgs)
        out["image_alts"].append(alts)
        out["title"].append(title)
        out["parse_error"].append(err)
    return pd.DataFrame(out)


def with_parsed(df, body_col: str = "body", ctype_col: str = "content_type"):
    """Attach parsed.links / parsed.image_refs / parsed.image_alts /
    parsed.title / parse_error. Rows whose ``meta`` map carries a
    ``charset`` key get that encoding FORCED ahead of the detector — the
    per-request override of net.go:94/199-201, honored identically by both
    fetch legs (the parse stage is shared)."""
    forced = (
        F.element_at(F.col("meta"), F.lit("charset"))
        if "meta" in df.columns
        else F.lit(None).cast("string")
    )
    return (
        df.withColumn(
            "_parsed", parse_body_udf(F.col(body_col), F.col(ctype_col), forced)
        )
        .withColumn("links", F.col("_parsed.links"))
        .withColumn("image_refs", F.col("_parsed.image_refs"))
        .withColumn("image_alts", F.col("_parsed.image_alts"))
        .withColumn("title", F.col("_parsed.title"))
        .withColumn("parse_error", F.col("_parsed.parse_error"))
        .drop("_parsed")
    )
