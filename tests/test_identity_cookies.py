"""Request identity (H1/F6 full-hash semantics), cookie jar (P9), charset
detection (S7), and POST builders (net.go:31-85) — round-2 surface mirroring
TestReqDeduplicate (extensions_test.go:199-232), TestCookieJar
(net_test.go:116-137), TestNetDecode (net_test.go:82-92), TestPost
(net_test.go:40-80)."""

import shutil

from pyspark.sql import functions as F

from goribot_spark import requests as R
from goribot_spark.canon import canonical_url, request_hash, url_hash
from goribot_spark.engine import CrawlConfig, CrawlEngine
from goribot_spark.operators.parse import _parse_one


# -- unit: identity hashing -------------------------------------------------


def test_request_hash_header_sensitivity():
    """tools.go:52-75: headers/cookies/body are part of the key; empty or
    non-shaping meta hashes to the plain canonical URL."""
    u = "http://site0.test/p/0"
    assert request_hash(u, None) == url_hash(u)
    assert request_hash(u, {}) == url_hash(u)
    assert request_hash(u, {"user": "k"}) == url_hash(u)  # plain meta: not shaping
    h1 = request_hash(u, {"h:X-Extra": "1"})
    assert h1 != url_hash(u)
    assert h1 == request_hash(u, {"h:X-Extra": "1", "user": "k"})
    assert h1 != request_hash(u, {"h:X-Extra": "2"})
    assert request_hash(u, {"c:sid": "a"}) != url_hash(u)
    assert request_hash(u, {"body": "x=1"}) != url_hash(u)


def test_post_builders():
    url, m = R.post_form("http://h.test/f", {"b": "2", "a": "1"})
    assert m["method"] == "POST" and m["body"] == "b=2&a=1"
    assert m["h:Content-Type"] == "application/x-www-form-urlencoded"
    url2, m2 = R.post_json("http://h.test/f", {"b": 2, "a": 1})
    assert m2["body"] == '{"a":1,"b":2}'  # deterministic serialization
    # method is NOT hashed (GetRequestHash omits it), body IS:
    g = R.get("http://h.test/f")
    assert request_hash(*R.post_raw("http://h.test/f", "")) == request_hash(*g)
    assert request_hash(url, m) != request_hash(*g)
    assert canonical_url(R.add_param("http://h.test/f?z=9", "a b", "c&d")) == \
        canonical_url("http://h.test/f?a+b=c%26d&z=9")


# -- engine: TestReqDeduplicate analog --------------------------------------


def test_req_dedup_full_identity(spark, fx, tmp_path):
    """Same URL twice → one fetch; same URL + extra header → two fetches
    (extensions_test.go:199-232)."""
    u = "http://site2.test/p/0"
    run = tmp_path / "dup"
    shutil.rmtree(run, ignore_errors=True)
    eng = CrawlEngine(spark, fx, str(run), CrawlConfig(max_depth=1, retry_max=2))
    eng.seed([u, u])
    eng.run()
    seqs = {
        r["seq"]
        for r in eng.store.fetch_log().where(F.col("url") == u).collect()
    }
    assert len(seqs) == 1  # identical duplicate dropped

    run2 = tmp_path / "hdr"
    shutil.rmtree(run2, ignore_errors=True)
    eng2 = CrawlEngine(spark, fx, str(run2), CrawlConfig(max_depth=1, retry_max=2))
    eng2.seed_requests([R.get(u), R.get(u, headers={"X-Extra": "1"})])
    eng2.run()
    seqs2 = {
        r["seq"]
        for r in eng2.store.fetch_log().where(F.col("url") == u).collect()
    }
    assert len(seqs2) == 2  # extra header → distinct request identity


def test_children_do_not_inherit_request_shape(spark, fx, tmp_path):
    """A discovered link is a fresh GET (goribot.go:163-172): h:/c:/body keys
    are stripped from inherited meta, plain user meta is kept."""
    run = tmp_path / "strip"
    shutil.rmtree(run, ignore_errors=True)
    eng = CrawlEngine(spark, fx, str(run), CrawlConfig(max_depth=2, retry_max=2))
    eng.seed_requests(
        [R.get("http://site2.test/p/0", headers={"X-Extra": "1"},
               meta={"user": "kept"})]
    )
    eng.run()
    kids = eng.store.read("frontier").where(F.col("depth") == 2).collect()
    assert kids
    for r in kids:
        meta = r["meta"] or {}
        assert "h:X-Extra" not in meta
        assert meta.get("user") == "kept"


# -- cookie jar (P9, cross-wave) --------------------------------------------


def _cookie_gate(name):
    """OnReq stage: depth-4 requests require jar cookie ``name`` (the Spark
    analog of TestCookieJar's server checking the cookie on later requests).
    The fixture's cookie-setting pages (k%13==5) sit at crawl depth 3, so
    the cookie exists in the jar before any depth-4 wave runs."""

    def stage(df):
        return df.where(
            (F.col("depth") <= 3)
            | F.element_at(F.col("jar_cookies"), F.lit(name)).isNotNull()
        )

    return stage


def _fetched_depth4_count(eng):
    res = eng.store.read("results").select("src_url").distinct()
    d4 = (
        eng.store.read("frontier")
        .where(F.col("depth") == 4)
        .select("url")
        .distinct()
    )
    return res.join(d4, res.src_url == d4.url).count()


def test_cookie_jar_cross_wave(spark, fx_deep, tmp_path):
    """Cookies set by wave-N responses (fixture pages k%13==5, crawl depth
    3) are attached to wave-N+1 requests; a gate requiring them at depth 4
    passes. The never-set cookie gate proves the positive isn't vacuous."""
    seeds = ["http://site0.test/p/0"]
    run = tmp_path / "jar"
    shutil.rmtree(run, ignore_errors=True)
    eng = CrawlEngine(
        spark, fx_deep, str(run),
        CrawlConfig(max_depth=4, retry_max=2, max_waves=14,
                    on_req=[_cookie_gate("session")]),
    )
    eng.seed(seeds)
    eng.run()
    assert _fetched_depth4_count(eng) > 0  # cookie was attached at depth 4
    jar = {r["host"]: r["cookies"] for r in eng.store.host_state().collect()}
    assert jar["site0.test"]["session"].startswith("site0.test-k")

    run2 = tmp_path / "nojar"
    shutil.rmtree(run2, ignore_errors=True)
    eng2 = CrawlEngine(
        spark, fx_deep, str(run2),
        CrawlConfig(max_depth=4, retry_max=2, max_waves=14,
                    on_req=[_cookie_gate("never_set")]),
    )
    eng2.seed(seeds)
    eng2.run()
    assert _fetched_depth4_count(eng2) == 0


# -- charset detection (S7) -------------------------------------------------


def test_charset_detection_undeclared_gbk():
    """net.go:202-206 chardet semantics: a GBK page with no charset anywhere
    decodes correctly via the strict-UTF-8 → GBK fallback."""
    body = (
        "<html><head><title>标题 中文页</title></head><body>"
        '<a href="/p/1">链接</a></body></html>'
    ).encode("gbk")
    links, imgs, _alts, title, err = _parse_one(body, "text/html")
    assert err is None and title == "标题 中文页" and links == ["/p/1"]


def test_charset_detection_meta_and_bom():
    gbk_meta = (
        '<html><head><meta charset="gbk"><title>页</title></head>'
        "<body></body></html>"
    ).encode("gbk")
    _, _, _, title, err = _parse_one(gbk_meta, "text/html")
    assert err is None and title == "页"
    bom = "\ufeff<html><head><title>bom页</title></head><body></body></html>".encode(
        "utf-8-sig"
    )
    _, _, _, title2, err2 = _parse_one(bom, "text/html")
    assert err2 is None and title2 == "bom页"


def test_charset_declared_still_wins():
    body = "<html><head><title>中文</title></head><body></body></html>".encode("gbk")
    _, _, _, title, err = _parse_one(body, "text/html; charset=gbk")
    assert err is None and title == "中文"


def test_fixture_undeclared_gbk_page_parses(spark, fx):
    """Fixture-level: the undeclared-GBK page (k=11) yields the same link
    set as the pages table's ground-truth links column."""
    from goribot_spark.operators.parse import with_parsed

    pages = spark.read.parquet(f"{fx}/pages.parquet")
    gbk = pages.where(
        (F.col("content_type") == "text/html") & (F.col("url").endswith("/p/11"))
    )
    assert gbk.count() >= 1
    parsed = with_parsed(
        gbk.select("url", "body", F.col("content_type"), F.col("links").alias("want"))
    ).collect()
    for r in parsed:
        assert r["parse_error"] is None
        assert r["links"] == list(r["want"])
        assert "中文页" in r["title"]


def test_charset_detection_undeclared_legacy_multilang():
    """r4 verdict missing #1 (net.go:202-206 chardet parity): undeclared
    Shift-JIS, Big5, EUC-KR, and cp1252 (legacy-latin) pages all decode
    correctly via the scored legacy sniff — same contract as the GBK test,
    across the encodings a multilingual crawl actually hits."""
    cases = {
        "shift_jis": ("日本語のページです", "リンク"),
        "big5": ("這是中文網頁標題", "連結"),
        "euc_kr": ("한국어 웹 페이지", "링크"),
        "cp1252": ("Café — déjà vu, naïveté", "lien préféré"),
    }
    for enc, (title_txt, link_txt) in cases.items():
        body = (
            f"<html><head><title>{title_txt}</title></head><body>"
            f'<a href="/p/1">{link_txt}</a></body></html>'
        ).encode(enc)
        links, _imgs, _alts, title, err = _parse_one(body, "text/html")
        assert err is None, (enc, err)
        assert title == title_txt, (enc, title)
        assert links == ["/p/1"], (enc, links)


def test_charset_sniff_gbk_still_wins_over_cp1252():
    """The scored sniff must not regress the original GBK case: dense CJK
    bytes decode as GBK (score ~2/char) even though cp1252 never fails."""
    body = "纯中文无标点内容页面测试字符集探测逻辑".encode("gbk")
    from goribot_spark.operators.parse import _sniff_legacy

    assert _sniff_legacy(body) == "纯中文无标点内容页面测试字符集探测逻辑"


def test_charset_sniff_bounded_sample_ascii_head():
    """The sniff's Python scoring is capped (_SNIFF_SCORE_CAP chars) but
    anchored at the first non-ASCII char — so a page whose legacy bytes sit
    after a multi-cap ASCII head still detects correctly, and the scored
    sample (not the strict decode) is what's bounded."""
    from goribot_spark.operators.parse import _SNIFF_SCORE_CAP, _sniff_legacy

    head = "<p>" + ("ascii filler text " * (_SNIFF_SCORE_CAP // 6)) + "</p>"
    tail = "日本語のページです、リンク先の説明文。"
    body = (head + tail).encode("shift_jis")
    assert len(head) > 2 * _SNIFF_SCORE_CAP  # the head alone exceeds the cap
    assert _sniff_legacy(body) == head + tail
