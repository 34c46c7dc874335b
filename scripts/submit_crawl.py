"""spark-submit entry point for the crawl engine (north-rule launch mode).

Packages ``goribot_spark`` as a zip and launches the superstep crawl through
``spark-submit --py-files`` — the same invocation that works on a real
multi-executor cluster (YARN/K8s/standalone): only ``--master`` changes.

Two modes:

  python scripts/submit_crawl.py --package-and-submit \
      --fixtures /tmp/fx --run-dir /tmp/run --seeds http://site0.test/p/0 \
      --master 'local[8]'
      # builds /tmp/goribot_spark.zip, then exec's:
      #   spark-submit --master local[8] --py-files /tmp/goribot_spark.zip \
      #       scripts/submit_crawl.py --fixtures ... --run-dir ... --seeds ...

  spark-submit --py-files goribot_spark.zip scripts/submit_crawl.py \
      --fixtures ... --run-dir ... --seeds ...        # direct (cluster) form

Prints one JSON line of run stats (waves, pages, images, wall) on completion.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import zipfile


def build_zip(repo_root: str, out_path: str) -> str:
    """Zip the goribot_spark package for --py-files shipping."""
    pkg = os.path.join(repo_root, "goribot_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, repo_root))
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", required=True)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--seeds", nargs="+", required=True)
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--retry-max", type=int, default=2)
    ap.add_argument("--max-waves", type=int, default=64)
    ap.add_argument("--master", default=None, help="only used with --package-and-submit")
    ap.add_argument("--package-and-submit", action="store_true")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    if args.package_and_submit:
        zip_path = build_zip(repo_root, "/tmp/goribot_spark.zip")
        cmd = ["spark-submit"]
        if args.master:
            cmd += ["--master", args.master]
        cmd += ["--py-files", zip_path, os.path.abspath(__file__)]
        cmd += ["--fixtures", args.fixtures, "--run-dir", args.run_dir]
        cmd += ["--seeds", *args.seeds]
        cmd += ["--retry-max", str(args.retry_max), "--max-waves", str(args.max_waves)]
        if args.max_depth is not None:
            cmd += ["--max-depth", str(args.max_depth)]
        raise SystemExit(subprocess.run(cmd).returncode)

    # Executor side: goribot_spark importable via --py-files zip (or the repo
    # checkout when run locally).
    from pyspark.sql import SparkSession

    from goribot_spark.engine import CrawlConfig, CrawlEngine

    spark = (
        SparkSession.builder.appName("goribot-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    cfg = CrawlConfig(
        retry_max=args.retry_max,
        max_depth=args.max_depth,
        max_waves=args.max_waves,
    )
    eng = CrawlEngine(spark, args.fixtures, args.run_dir, cfg)
    t0 = time.time()
    eng.seed(args.seeds)
    waves = eng.run()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "waves": len(waves),
                "pages": sum(w.get("scheduled", 0) for w in waves),
                "images": sum(w.get("images", 0) for w in waves),
                "wall_sec": round(wall, 2),
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
