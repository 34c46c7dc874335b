import shutil

import pytest

from goribot_spark.engine import CrawlConfig, CrawlEngine
from goribot_spark.session import get_spark
from goribot_spark.sources.fixtures import generate_all


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="goribot-spark-tests",
        master="local[8]",
        shuffle_partitions=4,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx(tmp_path_factory):
    """Small deterministic web graph: 3 hosts, depth 2 (47 pages, 64 images)."""
    d = str(tmp_path_factory.mktemp("fx"))
    generate_all(d, n_hosts=3, depth=2, n_images=64)
    return d


@pytest.fixture(scope="session")
def fx_deep(tmp_path_factory):
    """Deeper graph for DFS/depth scenarios: 2 hosts, depth 3."""
    d = str(tmp_path_factory.mktemp("fxd"))
    generate_all(d, n_hosts=2, depth=3, n_images=64)
    return d


def crawl(spark, fixtures_dir, run_dir, seeds, **cfg_kwargs):
    """Run a crawl to completion; returns the engine."""
    shutil.rmtree(run_dir, ignore_errors=True)
    cfg = CrawlConfig(**cfg_kwargs)
    eng = CrawlEngine(spark, fixtures_dir, str(run_dir), cfg)
    eng.seed(seeds)
    eng.run()
    return eng


def engine_fetched_set(eng):
    """Successful-fetch set {(url_hash, depth)} — engine side of the oracle."""
    from pyspark.sql import functions as F

    log = eng.store.fetch_log()
    pages = eng.pages.select("url_hash", "fail_times", F.col("status").alias("pstatus"))
    ok = log.join(pages, "url_hash").where(
        (F.col("retry_count") >= F.col("fail_times"))
        & F.col("pstatus").isin(list(eng.cfg.okcodes))
    )
    return {(r["url_hash"], r["depth"]) for r in ok.select("url_hash", "depth").collect()}


def engine_attempt_counts(eng):
    from pyspark.sql import functions as F

    rows = eng.store.fetch_log().groupBy("url").agg(F.count("*").alias("n")).collect()
    return {r["url"]: r["n"] for r in rows}


def engine_items_set(eng):
    rows = eng.store.read("results").select("src_url", "image_id").collect()
    return {(r["src_url"], r["image_id"]) for r in rows}
