"""Request builders — the Get/Post constructor surface (net.go:31-85) and
builder methods (SetHeader net.go:126-131, AddCookie net.go:117-122,
AddParam net.go:150-158) as plain functions producing ``(url, meta)`` seed
pairs.

Request shape rides in the frontier's meta map under reserved keys
(canon.py): ``h:<Header>`` headers, ``c:<name>`` cookies, ``body``,
``method``. Headers/cookies/body enter the dedup key exactly like
GetRequestHash (tools.go:52-75); method does not (the reference hash omits
it too). Feed the pairs to ``CrawlEngine.seed(urls, meta=metas)`` or
``seed_requests``.
"""

from __future__ import annotations

import json as _json
from urllib.parse import quote_plus, urlencode

Request = tuple[str, dict | None]


def _build(
    url: str,
    method: str | None = None,
    body: str | None = None,
    headers: dict[str, str] | None = None,
    cookies: dict[str, str] | None = None,
    meta: dict[str, str] | None = None,
) -> Request:
    m: dict[str, str] = dict(meta or {})
    for k, v in (headers or {}).items():
        m[f"h:{k}"] = v
    for k, v in (cookies or {}).items():
        m[f"c:{k}"] = v
    if body is not None:
        m["body"] = body
    if method is not None and method != "GET":
        m["method"] = method
    return url, (m or None)


def get(url: str, **kw) -> Request:
    """Get (net.go:31-41)."""
    return _build(url, **kw)


def post_raw(url: str, body: str, **kw) -> Request:
    """PostRawReq (net.go:60-62): opaque body string."""
    return _build(url, method="POST", body=body, **kw)


def post_form(url: str, data: dict[str, str], headers=None, **kw) -> Request:
    """PostFormReq (net.go:65-74): url-encoded form body."""
    h = {"Content-Type": "application/x-www-form-urlencoded", **(headers or {})}
    return _build(url, method="POST", body=urlencode(data), headers=h, **kw)


def post_json(url: str, obj, headers=None, **kw) -> Request:
    """PostJsonReq (net.go:77-85): JSON body (compact separators, sorted
    keys — deterministic serialization replaces Go's field order)."""
    h = {"Content-Type": "application/json", **(headers or {})}
    body = _json.dumps(obj, sort_keys=True, separators=(",", ":"))
    return _build(url, method="POST", body=body, headers=h, **kw)


def add_param(url: str, key: str, value: str) -> str:
    """Request.AddParam (net.go:150-158): append url-encoded k=v."""
    sep = "&" if "?" in url else "?"
    return f"{url}{sep}{quote_plus(key)}={quote_plus(value)}"
