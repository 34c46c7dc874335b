"""In-crawl cost of auto-compaction (r4 verdict ask #8).

scripts/compact_bench.py measured the RESUME-read win (4-7x at 150 waves);
this measures what the fold costs WHILE crawling: the default bench crawl
(redraw guard disabled, raw draws) with compact_every_waves off vs N,
alternating modes so host steal hits both. Crawl outputs must agree.
The r5 tiered fold makes each in-crawl fold O(waves since last fold), so
the expected cost is a small constant per fold rather than O(total rows).

Writes BENCH/compact_crawl_bench.json.
Usage: python scripts/compact_crawl_bench.py [n_draws] [compact_every]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_draw(compact_every: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SKIP_QUERIES="1",
        SPARK_GRAFT_CRAWL_REDRAW_SEC="0",
    )
    if compact_every:
        env["SPARK_GRAFT_COMPACT_EVERY"] = str(compact_every)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["crawl"]


def main() -> None:
    n_draws = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    draws: dict[str, list[dict]] = {"off": [], f"every_{every}": []}
    for i in range(n_draws):
        for mode, ce in (("off", 0), (f"every_{every}", every)):
            c = run_draw(ce)
            draws[mode].append(c)
            print(json.dumps({"mode": mode, "draw": i, **c}))
    sig = {(c["pages"], c["waves"], c["images_decoded"])
           for cs in draws.values() for c in cs}
    assert len(sig) == 1, f"compaction changed crawl output: {sig}"
    payload = {
        "compact_every": every,
        "draws": draws,
        "wall_min_off": min(c["wall_sec"] for c in draws["off"]),
        f"wall_min_every_{every}": min(c["wall_sec"] for c in draws[f"every_{every}"]),
        "output_signature": list(sig)[0],
        "note": "raw draws (redraw guard disabled), alternating modes",
    }
    with open(os.path.join(REPO, "BENCH", "compact_crawl_bench.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "draws"}))


if __name__ == "__main__":
    main()
