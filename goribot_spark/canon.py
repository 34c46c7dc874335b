"""URL/request canonicalization and hashing (reference parity: tools.go:22-78).

The reference dedup key is the MD5 of a canonical string
``canon_url + "@#@" + sorted_headers + "@#@" + cookies + body``
(GetRequestHash, /root/reference/tools.go:22-78). We reproduce that string
byte-for-byte, expose the MD5 for parity tests, and additionally derive a
64-bit ``url_hash`` (xxhash64, seed 42 — identical to Spark's builtin
``F.xxhash64`` on the canonical string) used as the distributed join key.

Inside Spark plans, canonicalization runs as an Arrow-vectorized pandas UDF
producing the canonical string; the hash itself stays JVM-side via
``F.xxhash64`` so the anti-join key never crosses into Python. The
pure-Python ``xxh64`` here exists so the fixture generator and driver-side
helpers produce bit-identical keys (parity-tested against Spark).
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qs, quote_plus, urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# xxHash64 (pure Python, streaming-free variant) — matches Spark's xxhash64
# with its fixed seed 42. Public algorithm (Yann Collet, BSD).
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return ((h * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data``; returns a SIGNED 64-bit int (Spark LongType)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# Canonicalization — byte parity with GetRequestHash (tools.go:22-78).
# ---------------------------------------------------------------------------


def canonical_url(url: str) -> str:
    """Canonical URL string, matching tools.go:24-50.

    scheme://[user[:pass]@]lower(host[:port])[/]path?k=v&... with query keys
    AND values sorted and url-encoded (Go url.QueryEscape == quote_plus).
    """
    u = urlsplit(url)
    out = u.scheme + "://"
    if u.username is not None:
        out += u.username
        if u.password is not None:
            out += ":" + u.password
        out += "@"
    host = (u.hostname or "").lower()
    if u.port is not None:
        host += f":{u.port}"
    out += host
    path = u.path
    if path and not path.startswith("/"):
        out += "/"
    out += path
    if u.query:
        # Go's u.Query() splits on '&', keeps blank values (tools.go:35-49).
        params = parse_qs(u.query, keep_blank_values=True, separator="&")
        parts: list[str] = []
        for k in sorted(params):
            for v in sorted(params[k]):
                parts.append(quote_plus(k) + "=" + quote_plus(v))
        out += "?" + "&".join(parts)
    return out


def canonical_request_bytes(
    url: str,
    headers: dict[str, list[str]] | None = None,
    cookies: list[tuple[str, str]] | None = None,
    body: bytes = b"",
) -> bytes:
    """Full canonical request bytes (tools.go:52-75): url @#@ headers @#@ cookies + body."""
    header_parts: list[str] = []
    if headers:
        for k in sorted(headers):
            for v in sorted(headers[k]):
                header_parts.append(quote_plus(k) + "=" + quote_plus(v))
    cookie_str = "&".join(f"{n}={v}" for n, v in (cookies or []))
    s = "@#@".join([canonical_url(url), "&".join(header_parts), cookie_str])
    return s.encode("utf-8") + body


def request_md5(
    url: str,
    headers: dict[str, list[str]] | None = None,
    cookies: list[tuple[str, str]] | None = None,
    body: bytes = b"",
) -> str:
    """Hex MD5 of the canonical request — exact GetRequestHash parity (tools.go:76-77)."""
    return hashlib.md5(canonical_request_bytes(url, headers, cookies, body)).hexdigest()


def url_hash(url: str) -> int:
    """Signed-64 xxhash of the canonical URL — the engine's frontier/seen key."""
    return xxh64(canonical_url(url).encode("utf-8"))


# ---------------------------------------------------------------------------
# Full request identity (tools.go:52-75): the reference dedup hash covers
# headers + cookies + body, and TestReqDeduplicate (extensions_test.go:199-232)
# asserts a child differing only by a header IS fetched. Frontier rows carry
# request shape in the meta map under reserved keys:
#     h:<Header-Name> → request header        (net.go:126-131 SetHeader)
#     c:<name>        → explicit cookie       (net.go:117-122 AddCookie)
#     body            → request body string   (net.go:47-85 POST variants)
#     method          → HTTP verb; NOT hashed (GetRequestHash omits it too)
# Rows without any of these hash to the plain canonical URL — identical keys
# to before, so URL-only crawls pay nothing.
# ---------------------------------------------------------------------------

_REQ_KEYS_PREFIXES = ("h:", "c:")


def canonical_request_str(url: str, meta: dict[str, str] | None) -> str:
    """Canonical request string incl. meta-carried headers/cookies/body.

    Matches canonical_request_bytes' layout (url @#@ headers @#@ cookies +
    body); cookie order is name-sorted (a map carries no insertion order —
    documented deviation from Go's slice order, deterministic either way)."""
    if not meta:
        return canonical_url(url)
    headers = {k[2:]: [v] for k, v in meta.items() if k.startswith("h:") and v is not None}
    cookies = sorted(
        (k[2:], v) for k, v in meta.items() if k.startswith("c:") and v is not None
    )
    body = meta.get("body") or ""
    if not headers and not cookies and not body:
        return canonical_url(url)
    return canonical_request_bytes(
        url, headers, cookies, body.encode("utf-8")
    ).decode("utf-8")


def request_hash(url: str, meta: dict[str, str] | None = None) -> int:
    """Signed-64 xxhash of the canonical request — meta-aware frontier key."""
    return xxh64(canonical_request_str(url, meta).encode("utf-8"))


# ---------------------------------------------------------------------------
# Spark-side: vectorized canonicalization; hashing stays in the JVM.
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched canonical-URL UDF (the only Python step of the dedup key)."""
    return urls.map(lambda u: canonical_url(u) if u is not None else None)


@F.pandas_udf(StringType())
def canonicalize_request_udf(urls: pd.Series, metas: pd.Series) -> pd.Series:
    """Meta-aware canonical-request UDF (headers/cookies/body in the key)."""
    return pd.Series(
        [
            canonical_request_str(u, m) if u is not None else None
            for u, m in zip(urls, metas)
        ]
    )


def with_url_hash(
    df, url_col: str = "url", out_col: str = "url_hash", meta_col: str | None = None
):
    """Add the canonical 64-bit key: pandas-UDF canonical string → JVM xxhash64.

    The xxhash64 itself is a builtin (whole-stage-codegen'd); only the string
    normalization crosses the Arrow boundary. With ``meta_col`` set, rows
    whose meta carries request-shaping keys (h:/c:/body) hash the full
    request identity (tools.go:52-75 semantics); other rows hash the URL.
    """
    if meta_col is not None:
        canon = canonicalize_request_udf(F.col(url_col), F.col(meta_col))
    else:
        canon = canonicalize_url_udf(F.col(url_col))
    return df.withColumn(out_col, F.xxhash64(canon))
