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

# Undeclared-legacy-charset candidates, tried strict and scored (see
# _sniff_legacy). Order is the deterministic tie-break.
_LEGACY_CODECS = ("gbk", "big5", "shift_jis", "euc_kr", "cp1252")

# Chars scored per candidate in _sniff_legacy (anchored at the first
# non-ASCII char); bounds the Python scoring loop on huge legacy pages.
_SNIFF_SCORE_CAP = 4096
_NON_ASCII_RE = re.compile(r"[^\x00-\x7f]")

# Frequency coherence (the public uchardet/chardet technique, shrunk to a
# literal set): GBK bytes of Chinese text strict-decode as EUC-KR too (both
# are EUC-style A1-FE grids), landing on RANDOM hangul — and vice versa. A
# correct decode concentrates on the language's most frequent characters;
# a cross-decode is uniform over the grid. Top-frequency Chinese chars and
# Korean syllables (standard published frequency lists) break the tie.
_COMMON_CJK = frozenset(
    "的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而要于"
    "就下得可你年生自会那后能对着事其里所去行过家十用发天如然作方成者多"
    "日都三小军二无同么经法当起与好看学进种将还分此心前面又定见只主没公"
    "从年使经动两长把万其来电文化工新想平美间再提直题党程展五果料象员革"
)
_COMMON_HANGUL = frozenset(
    "이다의에는을가하고지서한로기도를수있사대부정상시자제소인그나것들스"
    "시면으어해보게되우주년만적연리성국중날래전개만무주과니까지요네저희"
)


def _legacy_score(text: str, codec: str) -> float:
    """Plausibility of ``text`` being a correct decode for ``codec`` — a
    byte-distribution/script-range heuristic standing in for chardet
    (net.go:202-206): chars land in the codec's native script (kana for
    Shift-JIS, hangul for EUC-KR, common-URO CJK for GBK/Big5, accented
    latin for cp1252) score positive; rare blocks a WRONG decode scatters
    into (CJK Ext-A, PUA, compatibility ideographs, stray C1 controls)
    score negative. Linear in length, fully deterministic."""
    s = 0.0
    for ch in text:
        cp = ord(ch)
        if cp < 0x80:
            continue
        if 0x3040 <= cp <= 0x30FF:  # hiragana / katakana
            s += 3.0 if codec == "shift_jis" else -1.0
        elif 0xAC00 <= cp <= 0xD7A3:  # hangul syllables
            if codec == "euc_kr":
                s += 4.0 if ch in _COMMON_HANGUL else 1.5
            else:
                s -= 1.0
        elif 0x4E00 <= cp <= 0x9FA5:  # CJK (URO)
            if codec in ("gbk", "big5"):
                s += 4.0 if ch in _COMMON_CJK else 1.5
            elif codec == "shift_jis":
                s += 2.0 if ch in _COMMON_CJK else 1.0
            else:
                s += 1.0
        elif 0xFF61 <= cp <= 0xFF9F:
            s -= 0.5  # halfwidth katakana: typical GBK-as-SJIS misdecode
        elif 0x3000 <= cp <= 0x303F or 0xFF00 <= cp <= 0xFFEF:
            s += 0.5  # CJK punctuation / fullwidth forms
        elif codec == "cp1252" and (0x00C0 <= cp <= 0x00FF or 0x2013 <= cp <= 0x201E):
            s += 1.0  # accented latin / smart punctuation
        elif 0x3400 <= cp <= 0x4DBF or 0xE000 <= cp <= 0xFAFF:
            s -= 2.0  # Ext-A / PUA / compat ideographs: wrong-codec noise
        elif cp < 0xA0:
            s -= 1.0  # stray C1 controls
        else:
            s -= 0.25
    return s


def _sniff_legacy(body: bytes) -> str:
    """Decode undeclared non-UTF-8 bytes: strict-decode each legacy
    candidate, keep the highest-scoring plausible text (first candidate
    wins ties — deterministic). latin-1 is the never-fails floor.

    The strict decode stays full-body (C-speed, and a codec that can't
    decode the whole page must not win), but the Python scoring loop runs
    over a BOUNDED sample — ``_SNIFF_SCORE_CAP`` chars anchored at the
    candidate text's first non-ASCII character (chardet's bounded-sample
    technique) — so a multi-megabyte legacy page costs O(cap) Python per
    candidate instead of O(page), and a long ASCII head can't blind the
    detector."""
    best_text, best_score = None, float("-inf")
    for codec in _LEGACY_CODECS:
        try:
            text = body.decode(codec)
        except (UnicodeDecodeError, LookupError):
            continue
        m = _NON_ASCII_RE.search(text)
        start = m.start() if m else 0
        sc = _legacy_score(text[start : start + _SNIFF_SCORE_CAP], codec)
        if sc > best_score:
            best_text, best_score = text, sc
    if best_text is not None:
        return best_text
    return body.decode("latin-1")


def _decode_text(body: bytes, ctype: str, forced: str | None = None) -> str:
    """Charset resolution mirroring net.go:199-206 (forced encoding, else
    chardet auto-detection) with a deterministic detector: FORCED charset
    (Request.ResponseCharacterEncoding, net.go:94 — honored ahead of
    everything at net.go:199-201; carried as the ``charset`` meta key here)
    → declared charset → BOM → <meta charset> sniff in the first 1 KiB →
    strict-UTF-8 try → scored legacy sniff (_sniff_legacy: GBK / Big5 /
    Shift-JIS / EUC-KR / cp1252, latin-1 floor). Covers the reference's own
    detection test corpus (GBK pages without a charset declaration,
    net_test.go:82-92) plus the undeclared Shift-JIS/Big5/EUC-KR/legacy-
    latin pages chardet would catch, without a chardet dependency."""
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
        return _sniff_legacy(body)


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
