"""Canonicalization/hash parity (H1, reference tools.go:22-78)."""

from pyspark.sql import functions as F

from goribot_spark.canon import (
    canonical_url,
    request_md5,
    url_hash,
    with_url_hash,
    xxh64,
)


def test_canonical_url_basics():
    assert canonical_url("http://EXAMPLE.com/a/b") == "http://example.com/a/b"
    # Query keys AND values sorted (tools.go:40-48).
    assert (
        canonical_url("http://h.test/p?b=2&a=9&a=1")
        == "http://h.test/p?a=1&a=9&b=2"
    )
    # Blank values kept (Go url.Values keeps them).
    assert canonical_url("http://h.test/p?k") == "http://h.test/p?k="
    # Port kept, host lowered (tools.go:28).
    assert canonical_url("http://H.test:8080/x") == "http://h.test:8080/x"
    # Userinfo preserved (tools.go:25-27).
    assert canonical_url("http://u:p@H.test/x") == "http://u:p@h.test/x"
    # Space → '+' via QueryEscape parity.
    assert canonical_url("http://h.test/p?a=x%20y") == "http://h.test/p?a=x+y"


def test_request_md5_sensitivity():
    base = request_md5("http://h.test/p")
    # Same URL, different query order → same hash (dedup contract,
    # extensions_test.go:199-232 adds ?v=1 twice).
    assert request_md5("http://h.test/p?a=1&b=2") == request_md5(
        "http://h.test/p?b=2&a=1"
    )
    # Extra header → different hash (the child request with a header IS
    # fetched in TestReqDeduplicate).
    assert request_md5("http://h.test/p", headers={"X-Test": ["1"]}) != base
    assert request_md5("http://h.test/p", cookies=[("k", "v")]) != base
    assert request_md5("http://h.test/p", body=b"x") != base


def test_xxh64_matches_spark(spark):
    samples = [
        "",
        "a",
        "hello",
        "0123456789abcdef0123456789abcdef-and-more-bytes-here",
        "http://site0.test/p/0",
        "中文字符串测试",
        "x" * 100,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert xxh64(s.encode("utf-8")) == got[s], s


def test_with_url_hash_matches_python(spark):
    urls = [
        "http://Site0.test/p/3?b=2&a=1",
        "http://site1.test/p/0",
        "http://h.test/p?k",
    ]
    df = with_url_hash(spark.createDataFrame([(u,) for u in urls], "url string"))
    got = {r["url"]: r["url_hash"] for r in df.collect()}
    for u in urls:
        assert got[u] == url_hash(u), u
