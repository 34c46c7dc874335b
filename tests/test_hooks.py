"""Engine hook-surface tests (U1, U4-U7): the OnReq/OnResp/OnAdd/OnItem
chains and per-handler stages wired through run_wave, mirroring the
reference's extension API (goribot.go:101-105, 271-342; Use() pattern in
_docs/get-start.md:331-359) and TestRandomUserAgent
(extensions_test.go:234-254)."""

import shutil

from pyspark.sql import functions as F

from goribot_spark.engine import CrawlConfig, CrawlEngine
from goribot_spark.operators import handlers as H
from goribot_spark.operators.stages import host_filter, random_user_agent

from conftest import engine_attempt_counts


def run_crawl(spark, fx, run_dir, seeds, **cfg_kwargs):
    shutil.rmtree(run_dir, ignore_errors=True)
    cfg_kwargs.setdefault("max_depth", 2)
    cfg_kwargs.setdefault("max_waves", 10)
    cfg_kwargs.setdefault("retry_max", 2)  # site0.test/p/0 is flaky (fail_times=2)
    handler_id = cfg_kwargs.pop("handler_id", "extract_links_images")
    eng = CrawlEngine(spark, fx, str(run_dir), CrawlConfig(**cfg_kwargs))
    eng.seed(seeds, handler_id=handler_id)
    eng.run()
    return eng


def _ua_gate(df):
    """OnResp stage that nulls the link array unless the request carried a
    'ua' meta — makes the OnReq UA rewrite observable end-to-end."""
    return df.withColumn(
        "links",
        F.when(
            F.element_at(F.col("meta"), F.lit("ua")).isNotNull(), F.col("links")
        ),
    )


def test_on_req_random_ua_feeds_on_resp(spark, fx, tmp_path):
    """TestRandomUserAgent analog: the OnReq chain fills the UA before the
    response stage sees the request. Control: without the OnReq stage the
    gate nulls every link and the crawl stops at the seeds."""
    seeds = ["http://site0.test/p/0"]
    eng = run_crawl(
        spark, fx, tmp_path / "ua_on", seeds,
        on_req=[random_user_agent()], on_resp=[_ua_gate],
    )
    assert eng.store.fetch_log().select("url").distinct().count() > 1  # links survived

    ctrl = run_crawl(spark, fx, tmp_path / "ua_off", seeds, on_resp=[_ua_gate])
    # no UA → gate dropped every link → only the (retried) seed was fetched
    assert ctrl.store.fetch_log().select("url").distinct().count() == 1


def test_on_req_drop_consumes_without_fetch(spark, fx, tmp_path):
    """OnReq nil-return semantics (goribot.go:199, 274-282): a dropped
    request is consumed (never retried) but never fetched — its subtree is
    never discovered."""
    seeds = ["http://site0.test/p/0", "http://site1.test/p/0"]
    eng = run_crawl(
        spark, fx, tmp_path / "r", seeds,
        on_req=[host_filter(r"site1\.test", allow=False)],
    )
    # The site1 seed was scheduled (consumed)...
    consumed_urls = {r["url"] for r in eng.store.fetch_log().select("url").collect()}
    assert "http://site1.test/p/0" in consumed_urls
    # ...but never fetched: no site1 page ever produced items or children.
    src_hosts = {
        r["src_url"].split("/")[2]
        for r in eng.store.read("results").select("src_url").collect()
    }
    assert "site1.test" not in src_hosts and "site0.test" in src_hosts
    depth2_hosts = {
        r["host"]
        for r in eng.store.read("frontier").where(F.col("depth") == 2).collect()
    }
    assert "site1.test" not in depth2_hosts
    # urls_fetched metrics count only post-drop rows.
    fetched_n = (
        eng.store.read("metrics").agg(F.sum("urls_fetched").alias("n")).collect()[0]["n"]
    )
    assert fetched_n == len(consumed_urls) - 1  # everything but the dropped seed


def test_on_resp_link_rewrite(spark, fx, tmp_path):
    """OnResp hook rewriting parsed links prunes discovery downstream."""
    seeds = ["http://site0.test/p/0"]
    drop_p1 = lambda df: df.withColumn(  # noqa: E731
        "links", F.filter("links", lambda l: ~l.endswith("/p/1"))
    )
    eng = run_crawl(spark, fx, tmp_path / "r", seeds, on_resp=[drop_p1])
    counts = engine_attempt_counts(eng)
    assert "http://site0.test/p/1" not in counts
    assert "http://site0.test/p/2" in counts


def test_on_add_custom_admission(spark, fx, tmp_path):
    """Custom OnAdd hook (goribot.go:285-296) filters candidates before the
    built-in chain; the dropped page's subtree is never admitted."""
    seeds = ["http://site0.test/p/0"]
    no_p2 = lambda df: df.where(~F.col("url").endswith("/p/2"))  # noqa: E731
    eng = run_crawl(spark, fx, tmp_path / "r", seeds, on_add=[no_p2])
    counts = engine_attempt_counts(eng)
    assert "http://site0.test/p/2" not in counts
    assert "http://site0.test/p/9" not in counts  # child of p/2 (fanout 4)
    assert "http://site0.test/p/1" in counts


def test_on_item_global_stage(spark, fx, tmp_path):
    """OnItem chain (goribot.go:332-342) filters decoded items pre-sink."""
    seeds = ["http://site0.test/p/0"]
    wide_only = lambda df: df.where(F.col("w") >= 32)  # noqa: E731
    eng = run_crawl(spark, fx, tmp_path / "r", seeds, on_item=[wide_only])
    widths = [r["w"] for r in eng.store.read("results").select("w").collect()]
    assert widths and all(w >= 32 for w in widths)
    ctrl = run_crawl(spark, fx, tmp_path / "ctrl", seeds)
    ctrl_widths = [r["w"] for r in ctrl.store.read("results").select("w").collect()]
    assert any(w < 32 for w in ctrl_widths)  # control proves the stage did it


def test_per_handler_stages(spark, fx, tmp_path):
    """Handler.resp_stages / item_stages (U1/U4) apply ONLY to that
    handler's rows: a staged handler prunes links + items while the default
    handler in the same run shape is untouched."""
    H.register(
        H.Handler(
            "pruned",
            emit_links=True,
            emit_items=True,
            resp_stages=[
                lambda df: df.withColumn(
                    "links", F.filter("links", lambda l: ~l.endswith("/p/1"))
                )
            ],
            item_stages=[
                lambda df: df.where(
                    F.substring("image_id", -1, 1).cast("int") % 2 == 0
                )
            ],
        )
    )
    try:
        seeds = ["http://site0.test/p/0"]
        eng = run_crawl(spark, fx, tmp_path / "staged", seeds, handler_id="pruned")
        counts = engine_attempt_counts(eng)
        assert "http://site0.test/p/1" not in counts  # resp stage pruned it
        ids = [r["image_id"] for r in eng.store.read("results").collect()]
        assert ids and all(int(i[-1]) % 2 == 0 for i in ids)  # item stage

        ctrl = run_crawl(spark, fx, tmp_path / "ctrl", seeds)  # default handler
        assert "http://site0.test/p/1" in engine_attempt_counts(ctrl)
        ctrl_ids = [r["image_id"] for r in ctrl.store.read("results").collect()]
        assert any(int(i[-1]) % 2 == 1 for i in ctrl_ids)
    finally:
        H._REGISTRY.pop("pruned", None)


def test_on_start_on_finish(spark, fx, tmp_path):
    """OnStart/OnFinish lifecycle callbacks (goribot.go:251-268)."""
    calls = []
    eng = run_crawl(
        spark, fx, tmp_path / "r", ["http://site2.test/p/0"],
        on_start=lambda e: calls.append("start"),
        on_finish=lambda e: calls.append(("finish", e.store.last_wave())),
    )
    assert calls[0] == "start"
    assert calls[-1][0] == "finish" and calls[-1][1] == eng.store.last_wave()
