"""Live HTTP fetch stage (S4 — reference net.go:269-324).

The engine's default "fetch" is the synthetic ``wave ⋈ pages`` equi-join
(fixtures stand in for the network). This module is the REAL leg: an
Arrow-batched ``mapInPandas`` stage that issues the wave's HTTP requests
from inside the executors — the Spark shape of the reference's Downloader
(net.go:269-324): per-request proxy dial (net.go:283-290), headers/cookies/
body from the canonical request meta (net.go:117-131), User-Agent from the
``ua`` meta (extensions.go:330-346), cookie-jar cookies attached at send
time (net.go:261-263), and Set-Cookie capture back into the jar.

Scale shape: the wave arrives host-salted (politeness.salt_and_partition),
so each partition holds whole hosts and fetches them with a bounded local
thread pool — politeness budgets were already enforced globally upstream at
wave-selection time. Bodies are produced executor-side and flow straight
into the parse stage; nothing returns to the driver. Transport errors
(timeout, refused, DNS) become status=null rows, which the engine routes to
the retry/error path exactly like a failed synthetic fetch (R1/R2).

Gzip bodies are passed through raw — the parse stage's magic-byte gunzip
(parse.py, net.go:296-303) and charset detection (net.go:199-206) already
handle transfer decoding, shared verbatim between both fetch legs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

FETCH_FIELDS = [
    StructField("status", IntegerType(), True),
    StructField("content_type", StringType(), True),
    StructField("body", BinaryType(), True),
    StructField("set_cookies", MapType(StringType(), StringType()), True),
    # URL after redirects (urllib follows 3xx like the reference's net/http
    # client): relative links resolve against THIS (goribot.go:163-166 uses
    # resp.Request.URL, which net/http rewrites per hop), while the frontier
    # key / retry identity stays the REQUESTED url.
    StructField("final_url", StringType(), True),
]


def _as_dict(m) -> dict:
    """MapType values arrive as dicts (Arrow) or (k, v) tuple lists
    depending on conversion path; normalize."""
    if m is None:
        return {}
    if isinstance(m, dict):
        return {k: v for k, v in m.items() if v is not None}
    try:
        return {k: v for k, v in m if v is not None}
    except (TypeError, ValueError):
        return {}


def fetch_one(
    url: str,
    meta: dict | None,
    jar_cookies: dict | None,
    timeout_sec: float,
    default_ua: str,
):
    """One HTTP exchange → (status, content_type, body, set_cookies,
    final_url).

    Request shape comes from the same meta keys the canonical request hash
    covers (canon.py): ``h:<Header>`` → header, ``c:<name>`` → cookie
    (explicit cookies override jar cookies of the same name — the reference
    attaches jar cookies first, then per-request AddCookie), ``body`` +
    ``method`` → entity/verb, ``proxy`` → per-request proxy URL
    (SetProxy/RandomProxy, net.go:134-139, extensions.go:312-327), ``ua`` →
    User-Agent (RandomUserAgent). Transport failures return status None —
    never raise (R3: a bad row must not fail the partition)."""
    import urllib.error
    import urllib.request

    meta = _as_dict(meta)
    headers: dict[str, str] = {}
    for k, v in meta.items():
        if k.startswith("h:") and v is not None:
            headers[k[2:]] = v
    cookies = dict(_as_dict(jar_cookies))
    for k, v in meta.items():
        if k.startswith("c:") and v is not None:
            cookies[k[2:]] = v
    if cookies:
        headers["Cookie"] = "; ".join(f"{k}={v}" for k, v in sorted(cookies.items()))
    headers.setdefault("User-Agent", meta.get("ua") or default_ua)
    body = meta.get("body")
    data = body.encode("utf-8") if body else None
    method = meta.get("method") or ("POST" if data else "GET")
    proxy = meta.get("proxy")
    handlers = []
    if proxy:
        handlers.append(urllib.request.ProxyHandler({"http": proxy, "https": proxy}))
    opener = urllib.request.build_opener(*handlers)
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    try:
        with opener.open(req, timeout=timeout_sec) as resp:
            raw = resp.read()
            ctype = resp.headers.get("Content-Type")
            set_cookies = _parse_set_cookies(resp.headers)
            return int(resp.status), ctype, raw, set_cookies, resp.geturl()
    except urllib.error.HTTPError as e:
        # Non-2xx IS a completed exchange: status flows to the okcodes
        # filter / retry router, exactly like the synthetic page status.
        try:
            raw = e.read()
        except Exception:
            raw = None
        return (
            int(e.code),
            e.headers.get("Content-Type"),
            raw,
            _parse_set_cookies(e.headers),
            e.geturl(),
        )
    except Exception:
        return None, None, None, None, None  # transport error → retry path


def _parse_set_cookies(headers) -> dict[str, str] | None:
    out: dict[str, str] = {}
    for line in headers.get_all("Set-Cookie") or []:
        first = line.split(";", 1)[0]
        if "=" in first:
            k, v = first.split("=", 1)
            out[k.strip()] = v.strip()
    return out or None


def parse_robots_txt(text: str) -> list[tuple[str, str, bool]]:
    """robots.txt → (ua, path_prefix, allow) rows for the admission table
    (reference RobotsTxt extension, extensions.go:131-151, which delegates
    to a standard robots parser; apply_robots resolves longest-prefix +
    ua-specific-over-'*' precedence). Grammar: User-agent lines open a
    group (consecutive UA lines share it), Allow/Disallow lines attach to
    the current group; an empty Disallow value allows everything."""
    rules: list[tuple[str, str, bool]] = []
    uas: list[str] = []
    ua_block_open = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if ua_block_open:  # new group after rules → reset
                uas = []
                ua_block_open = False
            uas.append(val or "*")
        elif key in ("allow", "disallow"):
            ua_block_open = True
            if not val:  # "Disallow:" (empty) = allow all
                for ua in uas or ["*"]:
                    rules.append((ua, "/", True))
                continue
            for ua in uas or ["*"]:
                rules.append((ua, val, key == "allow"))
    return rules


ROBOTS_FETCH_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("ua", StringType(), False),
        StructField("path_prefix", StringType(), False),
        StructField("allow", StringType(), False),  # cast to bool by caller
        # "1" = do-not-cache marker (5xx / transport failure → RFC 9309
        # disallow-all for now, retried on a later wave); "0" = durable rule
        StructField("transient", StringType(), False),
    ]
)


def live_fetch_robots(
    hosts: DataFrame,
    timeout_sec: float = 5.0,
    threads: int = 8,
    default_ua: str = "goribot-spark",
) -> DataFrame:
    """(host, url) frame → parsed robots rules (host, ua, path_prefix,
    allow, transient). ``url`` is any URL of the host (the robots URL
    resolves as urljoin(url, '/robots.txt'), preserving scheme/port — the
    ``host`` column itself is portless). Outcome → caching per RFC 9309:
    2xx parses; 4xx (robots absent) yields a durable allow-all marker row so
    the host is never re-requested (the reference treats a missing
    robots.txt as allow-all); 5xx and transport failures (unreachable) yield
    a disallow-all row marked ``transient`` — the caller must NOT persist
    it, so a robots outage neither whitelists the host for the rest of the
    run nor blocks it forever (re-fetched next wave). mapInPandas — fetch +
    parse stay executor-side."""
    from urllib.parse import urljoin

    def batches(it):
        from concurrent.futures import ThreadPoolExecutor

        for pdf in it:
            out = {"host": [], "ua": [], "path_prefix": [], "allow": [], "transient": []}
            if len(pdf):
                urls = [urljoin(u, "/robots.txt") for u in pdf["url"]]
                with ThreadPoolExecutor(max_workers=min(threads, len(pdf))) as pool:
                    results = list(
                        pool.map(
                            lambda u: fetch_one(u, None, None, timeout_sec, default_ua),
                            urls,
                        )
                    )
                for host, (status, _ct, body, _sc, _fu) in zip(pdf["host"], results):
                    rules = []
                    transient = False
                    if status is not None and 200 <= status < 300 and body is not None:
                        try:
                            rules = parse_robots_txt(body.decode("utf-8", "replace"))
                        except Exception:
                            rules = []
                        if not rules:
                            rules = [("*", "/", True)]  # empty robots = allow all
                    elif status is not None and status < 500:
                        rules = [("*", "/", True)]  # 4xx: no robots → allow-all, cached
                    else:
                        # 5xx / transport error: RFC 9309 "unreachable" →
                        # disallow-all, but do NOT cache — retried next wave
                        rules = [("*", "/", False)]
                        transient = True
                    for ua, prefix, allow in rules:
                        out["host"].append(host)
                        out["ua"].append(ua)
                        out["path_prefix"].append(prefix)
                        out["allow"].append("1" if allow else "0")
                        out["transient"].append("1" if transient else "0")
            yield pd.DataFrame(out)

    return hosts.mapInPandas(batches, ROBOTS_FETCH_SCHEMA)


def live_fetch(
    df: DataFrame,
    timeout_sec: float = 5.0,
    threads: int = 8,
    default_ua: str = "goribot-spark",
) -> DataFrame:
    """mapInPandas fetch: input wave rows (must carry ``url``; ``meta`` and
    ``jar_cookies`` are honored when present) → same columns + (status,
    content_type, body, set_cookies). Per-batch bounded thread pool — the
    reference fetches concurrently per worker goroutine; here concurrency
    lives inside the executor partition, bounded by ``threads``."""
    out_schema = StructType(list(df.schema.fields) + FETCH_FIELDS)
    has_meta = "meta" in df.columns
    has_jar = "jar_cookies" in df.columns

    def fetch_batches(batches):
        from concurrent.futures import ThreadPoolExecutor

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pdf.assign(
                    status=pd.Series(dtype="object"),
                    content_type=pd.Series(dtype="object"),
                    body=pd.Series(dtype="object"),
                    set_cookies=pd.Series(dtype="object"),
                    final_url=pd.Series(dtype="object"),
                )
                continue
            metas = pdf["meta"] if has_meta else [None] * n
            jars = pdf["jar_cookies"] if has_jar else [None] * n
            args = [
                (u, m, j, timeout_sec, default_ua)
                for u, m, j in zip(pdf["url"], metas, jars)
            ]
            with ThreadPoolExecutor(max_workers=min(threads, n)) as pool:
                results = list(pool.map(lambda a: fetch_one(*a), args))
            yield pdf.assign(
                status=pd.Series([r[0] for r in results], index=pdf.index, dtype="object"),
                content_type=pd.Series([r[1] for r in results], index=pdf.index, dtype="object"),
                body=pd.Series([r[2] for r in results], index=pdf.index, dtype="object"),
                set_cookies=pd.Series([r[3] for r in results], index=pdf.index, dtype="object"),
                final_url=pd.Series([r[4] for r in results], index=pdf.index, dtype="object"),
            )

    return df.mapInPandas(fetch_batches, out_schema)
