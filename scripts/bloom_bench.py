"""Sharded-Bloom cost/benefit at bench scale (r4 verdict ask #2).

The bucket-sharded Bloom filter is the 10^10-frontier dedup path
(operators/bloom.py): identity to exact dedup is pytest-proven
(test_crawl_with_sharded_bloom_identical), but through round 4 its
wave-scale COST was never measured — the headline bench ran with
use_bloom=False. This script produces the missing data:

  1. TIMING — the default bench crawl (same shape as bench.py, redraw
     guard disabled so every wall is a raw draw) run in separate JVMs,
     alternating bloom=off / bloom=sharded, N draws each. Crawl outputs
     must agree (pages/waves/images equal) or the script fails.
  2. REDUCTION (diagnostic, in-process, never timed) — one bloom crawl
     with the probe shimmed to count rows: candidates probed, flagged
     definitely-new (skip the exact anti-join), flagged maybe-seen
     (anti-join input), and how many maybe-seen were real dups vs Bloom
     false positives.

Writes BENCH/bloom_bench.json. Usage: python scripts/bloom_bench.py [n_draws]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_draw(bloom: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SKIP_QUERIES="1",
        SPARK_GRAFT_CRAWL_REDRAW_SEC="0",  # raw draws; no selection policy
    )
    if bloom:
        env["SPARK_GRAFT_BLOOM"] = bloom
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["crawl"]


def reduction_diagnostic() -> dict:
    """One in-process sharded-bloom crawl with the probe shimmed to count
    its input/output rows. Diagnostic only — the extra count actions make
    this run meaningless for timing."""
    from goribot_spark.operators import bloom as B
    from goribot_spark.engine import CrawlConfig, CrawlEngine
    from goribot_spark.session import get_spark
    from bench import ensure_bench_fixture, BENCH_HOSTS
    import shutil
    from pyspark.sql import functions as F

    stats = {"probed": 0, "fresh_skipped_antijoin": 0, "maybe_seen": 0,
             "true_dups": 0, "bloom_false_positives": 0, "probe_calls": 0}
    orig = B.dedup_with_bloom_shards

    def counting(cand, seen, shards, n_shards=B.DEFAULT_NUM_SHARDS,
                 shard_bits=B.DEFAULT_NUM_BITS // B.DEFAULT_NUM_SHARDS):
        c = cand.persist()
        n_in = c.count()
        flagged = B.flag_with_bloom_shards(c, shards, n_shards, shard_bits).persist()
        maybe = flagged.where(F.col("_maybe")).count()
        exact_fresh = c.join(seen.select("url_hash"), "url_hash", "left_anti").count()
        true_dups = n_in - exact_fresh
        stats["probe_calls"] += 1
        stats["probed"] += n_in
        stats["fresh_skipped_antijoin"] += n_in - maybe
        stats["maybe_seen"] += maybe
        stats["true_dups"] += true_dups
        stats["bloom_false_positives"] += maybe - true_dups
        out = orig(c, seen, shards, n_shards=n_shards, shard_bits=shard_bits)
        assert out.count() == exact_fresh  # identity contract, per probe
        return out

    B.dedup_with_bloom_shards = counting
    try:
        fx = ensure_bench_fixture()
        rd = "/tmp/goribot_bloom_diag_run"
        shutil.rmtree(rd, ignore_errors=True)
        spark = get_spark(app_name="bloom-diag")
        spark.sparkContext.setLogLevel("ERROR")
        eng = CrawlEngine(
            spark, fx, rd,
            CrawlConfig(retry_max=2, max_waves=48, use_bloom=True,
                        bloom_sharded=True),
        )
        seeds = spark.range(BENCH_HOSTS).select(
            F.format_string("http://site%d.test/p/0", F.col("id")).alias("url")
        )
        eng.seed_frame(seeds)
        eng.run()
        spark.stop()
    finally:
        B.dedup_with_bloom_shards = orig
    return stats


def main() -> None:
    n_draws = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    draws: dict[str, list[dict]] = {"off": [], "sharded": []}
    for i in range(n_draws):
        for mode in ("off", "sharded"):  # alternate so steal hits both
            c = run_draw("" if mode == "off" else "sharded")
            draws[mode].append(c)
            print(json.dumps({"mode": mode, "draw": i, **c}))
    # identical-output contract
    sig = {(c["pages"], c["waves"], c["images_decoded"])
           for cs in draws.values() for c in cs}
    assert len(sig) == 1, f"bloom changed crawl output: {sig}"
    diag = reduction_diagnostic()
    payload = {
        "draws": draws,
        "wall_min_off": min(c["wall_sec"] for c in draws["off"]),
        "wall_min_sharded": min(c["wall_sec"] for c in draws["sharded"]),
        "output_signature": list(sig)[0],
        "reduction_diagnostic": diag,
        "note": "raw draws (redraw guard disabled), alternating modes; "
                "diagnostic run adds count actions and is never timed",
    }
    with open(os.path.join(REPO, "BENCH", "bloom_bench.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: payload[k] for k in
                      ("wall_min_off", "wall_min_sharded", "reduction_diagnostic")}))


if __name__ == "__main__":
    main()
