"""CrawlStore — snapshot-committed parquet tables for the crawl state.

Plays the role of Iceberg in the sandbox (no Iceberg jars available): each
table is a directory of per-wave parquet partitions, and a run ``manifest``
JSON records which waves are committed. A wave's writes become visible only
when the manifest is atomically replaced (write-temp + rename), so a crash
mid-wave leaves the previous snapshot intact and the run is resumable —
the checkpoint/lineage contract of the north rule. On a real cluster the
same layout maps 1:1 onto Iceberg appends + snapshot pinning (SURVEY.md §1.7,
replacing the reference's Redis lists, manager.go:14-16).

Frontier consumption is append-only: ``frontier`` accumulates discovered
rows, ``consumed`` accumulates (url_hash, retry_count) pairs that were
scheduled; the pending set is the anti-join of the two. Iceberg would express
the same with positional deletes + compaction; append-only keeps the sandbox
implementation honest about never rewriting O(frontier) state per wave.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goribot_spark import schemas

TABLES = (
    "frontier",
    "consumed",
    "seen",
    "results",
    "errors",
    "metrics",
    "host_state",
    "robots_live",
    "bloom_shards",
)

_SCHEMAS = {
    "frontier": schemas.FRONTIER,
    "seen": schemas.SEEN,
    "results": schemas.RESULTS,
    "errors": schemas.ERRORS,
    "metrics": schemas.METRICS,
    "robots_live": schemas.ROBOTS_RULES,
    "bloom_shards": schemas.BLOOM_SHARDS,
}


class CrawlStore:
    def __init__(self, spark: SparkSession, run_dir: str):
        self.spark = spark
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._manifest_path = os.path.join(run_dir, "manifest.json")
        self.manifest = self._load_manifest()

    # -- manifest / snapshot isolation ------------------------------------

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"waves": [], "driver_state": {}}

    def refresh(self) -> None:
        """Re-read the manifest from disk — picks up waves committed by
        OTHER sessions sharing this run_dir (the distributed-mode contract,
        manager.go:14-16: any worker may publish seeds/waves; a polling
        engine sees them on its next idle check)."""
        self.manifest = self._load_manifest()

    def committed_waves(self) -> list[int]:
        return [w["wave"] for w in self.manifest["waves"]]

    def last_wave(self) -> int:
        ws = self.committed_waves()
        return max(ws) if ws else -1

    def commit_wave(self, wave: int, stats: dict, driver_state: dict) -> None:
        """Atomically publish wave ``wave``: temp-write manifest then rename."""
        self.manifest["waves"].append({"wave": wave, **stats})
        self.manifest["driver_state"] = driver_state
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def rollback_uncommitted(self) -> None:
        """Drop wave directories newer than the last committed snapshot."""
        last = self.last_wave()
        for t in TABLES:
            tdir = os.path.join(self.run_dir, t)
            if not os.path.isdir(tdir):
                continue
            for d in os.listdir(tdir):
                if d.startswith("wave=") and int(d.split("=")[1]) > last:
                    shutil.rmtree(os.path.join(tdir, d))

    # -- IO ----------------------------------------------------------------

    def _wave_dir(self, table: str, wave: int) -> str:
        return os.path.join(self.run_dir, table, f"wave={wave}")

    def write(self, table: str, wave: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._wave_dir(table, wave))

    def append(self, table: str, wave: int, df: DataFrame) -> None:
        """Additive write within a wave. A wave can produce several
        increments of the same table (robots_live gets up to three: seed
        hosts, candidate hosts, image hosts) — ``write``'s overwrite would
        clobber the earlier increments, losing them from the resumable
        snapshot even though the in-memory union hides it during the run."""
        df.write.mode("append").parquet(self._wave_dir(table, wave))

    def read(self, table: str, upto_wave: int | None = None) -> DataFrame:
        """Union of committed wave partitions for ``table`` (snapshot read)."""
        upto = self.last_wave() if upto_wave is None else upto_wave
        dirs = [
            self._wave_dir(table, w)
            for w in self.committed_waves()
            if w <= upto and os.path.isdir(self._wave_dir(table, w))
        ]
        if not dirs:
            schema = _SCHEMAS.get(table)
            if table == "consumed":
                return self.spark.createDataFrame(
                    [], "url_hash long, retry_count int, seq long, wave int"
                )
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*dirs)

    def pending_frontier(self) -> DataFrame:
        """Discovered-but-not-yet-scheduled rows: frontier ⋉̸ consumed.

        Key is (url_hash, retry_count, seq): seq uniquifies duplicate
        enqueues when dedup is off, and a retry re-enqueue of an already
        consumed URL stays pending because its retry_count differs
        (dedup-exemption contract, reference extensions.go:293-295).
        """
        frontier = self.read("frontier")
        consumed = self.read("consumed")
        return frontier.join(
            consumed.select("url_hash", "retry_count", "seq"),
            on=["url_hash", "retry_count", "seq"],
            how="left_anti",
        )

    def fetch_log(self) -> DataFrame:
        """(url, url_hash, depth, retry_count, wave) of every scheduled fetch
        — the engine-side analog of the simulator's fetch trace."""
        frontier = self.read("frontier")
        consumed = self.read("consumed")
        return consumed.join(
            frontier.select("url", "url_hash", "retry_count", "seq", "depth"),
            on=["url_hash", "retry_count", "seq"],
            how="inner",
        )

    def seen(self) -> DataFrame:
        return self.read("seen")

    def has_host_state(self) -> bool:
        """True iff any committed wave wrote a host_state snapshot — an O(1)
        filesystem probe so crawls where no page ever set a cookie skip the
        jar join entirely (no per-wave plan cost for an empty state)."""
        return any(
            os.path.isdir(self._wave_dir("host_state", w))
            for w in self.committed_waves()
        )

    def host_state(self) -> DataFrame:
        """Per-host session state (cookie jar analog, net.go:261-263):
        (host, cookies map). STATE table, not a log — the latest committed
        wave's snapshot is the whole truth (each wave writes the fully
        merged jar), so only that one directory is read."""
        for w in sorted(self.committed_waves(), reverse=True):
            d = self._wave_dir("host_state", w)
            if os.path.isdir(d):
                return self.spark.read.parquet(d)
        return self.spark.createDataFrame([], schemas.HOST_STATE)

    def wave_path(self, table: str, wave: int) -> str:
        """Public path accessor for a wave partition (for footer-metadata
        row counts etc.) — keeps callers off the private layout."""
        return self._wave_dir(table, wave)

    # -- Bloom filter persistence (one .npy increment per wave) -----------

    def bloom_path(self, wave: int) -> str:
        d = os.path.join(self.run_dir, "bloom")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"wave={wave}.npy")

    def save_bloom(self, wave: int, bits) -> None:
        import numpy as np

        np.save(self.bloom_path(wave), bits)

    def load_bloom_union(self):
        """OR of all committed waves' Bloom increments (None if none)."""
        import numpy as np

        out = None
        for w in self.committed_waves():
            p = self.bloom_path(w)
            if os.path.exists(p):
                b = np.load(p)
                out = b if out is None else np.bitwise_or(out, b)
        return out

    def seed_seq_base(self) -> int:
        return int(self.manifest["driver_state"].get("seq_base", 0))

    def metrics_summary(self) -> DataFrame:
        m = self.read("metrics")
        return m.groupBy("wave").agg(
            F.sum("urls_scheduled").alias("urls_scheduled"),
            F.sum("urls_fetched").alias("urls_fetched"),
            F.sum("images_decoded").alias("images_decoded"),
            F.sum("errors").alias("errors"),
            F.max("wall_sec").alias("wall_sec"),
        )
