"""The north-rule launch mode: `spark-submit --py-files <pkg.zip>`.

goribot itself is a library launched from a user's `main` (reference
_examples/*.go); the Spark analog of "how a user actually runs this on a
cluster" is `spark-submit --py-files` with the package zipped
(scripts/submit_crawl.py). This test exercises that path for real — a
child spark-submit JVM, the zip on the executor python path, a full crawl
— and checks the run stats against the reference simulator on the same
fixture. Slow (~1 min: a second JVM + session), but it is the only test
that proves the repo is launchable the way the north rule prescribes;
BENCH/submit_crawl_evidence.json holds the bench-graph runs at two
parallelism levels with output-identity hashes.
"""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_crawl(fx, tmp_path):
    run_dir = str(tmp_path / "submit_run")
    shutil.rmtree(run_dir, ignore_errors=True)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            "--package-and-submit",
            "--fixtures", fx,
            "--run-dir", run_dir,
            "--seeds", "http://site0.test/p/0", "http://site1.test/p/0",
            "--retry-max", "2",
            "--master", "local[4]",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats_lines = [
        l for l in proc.stdout.splitlines() if l.startswith("{") and "waves" in l
    ]
    assert stats_lines, proc.stdout[-2000:]
    stats = json.loads(stats_lines[-1])

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from reference_sim import simulate

    sim = simulate(
        fx, seeds=["http://site0.test/p/0", "http://site1.test/p/0"], retry_max=2
    )
    assert stats["pages"] == len(sim.fetches)
    assert stats["images"] == len(sim.items)
    assert stats["waves"] >= 1
    # The child JVM's store is on disk — the crawl really committed.
    assert os.path.isdir(os.path.join(run_dir, "results"))
