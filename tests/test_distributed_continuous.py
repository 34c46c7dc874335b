"""Distributed multi-session cooperation + continuous (AutoStop=false) mode.

The reference's distributed mode shares one Redis store between producer and
consumer spiders (manager.go:14-16, manager_test.go:13-54); here the shared
CrawlStore run_dir plays that role: one session seeds and starts the crawl,
a second session (fresh SparkSession) resumes and finishes it, a third only
reads — and a polling engine picks up seeds appended mid-run by another
session, the SetAutoStop(false) contract (goribot.go:240-244).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goribot_spark.engine import CrawlConfig, CrawlEngine
from goribot_spark.sources.store import CrawlStore
from tests.conftest import crawl, engine_fetched_set


def test_two_session_distributed_handoff(spark, fx, tmp_path):
    seeds = ["http://site1.test/p/0", "http://site2.test/p/0"]
    # single-session reference crawl
    ref = crawl(spark, fx, tmp_path / "solo", seeds, retry_max=2, max_waves=12)

    run = str(tmp_path / "shared")
    # session A: seed + the first two waves, then stops mid-crawl
    a = CrawlEngine(spark, fx, run, CrawlConfig(retry_max=2, max_waves=12))
    a.seed(seeds)
    a.run(max_waves=2)
    assert a.store.pending_frontier().count() > 0  # genuinely mid-crawl

    # session B: a FRESH session (isolated SQL state, same cluster) opens the
    # same store and finishes the crawl — resume is pure table state.
    b = CrawlEngine(
        spark.newSession(), fx, run, CrawlConfig(retry_max=2, max_waves=12)
    )
    b.run()

    # session C: read-only tail of the shared results table.
    c = CrawlStore(spark.newSession(), run)
    assert (
        c.read("results").count() == ref.store.read("results").count() > 0
    )
    assert engine_fetched_set(b) == engine_fetched_set(ref)


def test_continuous_mode_picks_up_mid_run_seeds(spark, fx, tmp_path):
    """poll=True keeps the engine alive across empty waves; a seed published
    by ANOTHER session during an idle poll is crawled before exit."""
    run = str(tmp_path / "cont")
    eng = CrawlEngine(spark, fx, run, CrawlConfig(retry_max=2, max_waves=30))
    eng.seed(["http://site2.test/p/0"])
    state = {"seeded": False, "idles": 0}

    def pump(_engine, n_idle):
        state["idles"] += 1
        if not state["seeded"]:
            other = CrawlEngine(
                spark.newSession(), fx, run, CrawlConfig(retry_max=2)
            )
            other.seed(["http://site1.test/p/0"])
            state["seeded"] = True

    eng.run(poll=True, idle_waves=3, on_idle=pump)
    assert state["seeded"] and state["idles"] >= 2
    urls = {r["url"] for r in eng.store.fetch_log().select("url").collect()}
    # both subtrees fully crawled — including the one seeded mid-run
    assert "http://site1.test/p/0" in urls
    assert "http://site1.test/p/3" in urls  # depth-2 child of the late seed
    assert "http://site2.test/p/0" in urls


def test_seed_frame_max_req_order_parity(spark, fx, tmp_path):
    """Under a MaxReq rule, seed() (list position) and seed_frame() with an
    explicit input-order column admit the SAME set. The default order_col
    ("url") remains documented lexicographic behavior — a table has no
    inherent input order."""
    from goribot_spark.operators.admission import LimitRule

    urls = [
        "http://site2.test/p/5",
        "http://site0.test/p/3",
        "http://site1.test/p/4",
        "http://site0.test/p/1",
        "http://site2.test/p/2",
    ]
    cfg = lambda: CrawlConfig(rules=[LimitRule("*", max_req=3)])  # noqa: E731
    a = CrawlEngine(spark, fx, str(tmp_path / "bylist"), cfg())
    assert a.seed(urls) == 3
    got_a = {r["url"] for r in a.store.read("frontier").select("url").collect()}
    assert got_a == set(urls[:3])  # input order wins

    # explicit input-order column → identical admitted set to seed()
    b = CrawlEngine(spark, fx, str(tmp_path / "byframe"), cfg())
    frame = spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, ord int"
    )
    assert b.seed_frame(frame, order_col="ord") == 3
    got_b = {r["url"] for r in b.store.read("frontier").select("url").collect()}
    assert got_b == got_a

    # default order_col: documented lexicographic ranking
    c = CrawlEngine(spark, fx, str(tmp_path / "bydefault"), cfg())
    assert c.seed_frame(spark.createDataFrame([(u,) for u in urls], "url string")) == 3
    got_c = {r["url"] for r in c.store.read("frontier").select("url").collect()}
    assert got_c == set(sorted(urls)[:3])
