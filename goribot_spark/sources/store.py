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

``compact()`` is the Iceberg-compaction analog: per-wave directories fold
into one ``base=<wave>`` snapshot per table so a long crawl's resume cost
stays O(1) in wave count instead of re-listing thousands of wave dirs
(``mode="files"``, lossless), or the frontier/consumed log pair collapses to
the pending set (``mode="state"`` — the positional-delete-compaction analog,
which drops the pre-compaction fetch history the way Iceberg snapshot expiry
does). The base write is published by the same atomic manifest rename as a
wave commit, so a crash mid-compaction leaves the old snapshot intact.
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

    def _base_through(self, table: str) -> int:
        """Wave through which ``table`` has been compacted (-1 = never)."""
        return int(self.manifest.get("bases", {}).get(table, -1))

    def _base_dir(self, table: str, through: int) -> str:
        return os.path.join(self.run_dir, table, f"base={through}")

    def rollback_uncommitted(self) -> None:
        """Drop wave directories newer than the last committed snapshot,
        plus compaction leftovers a crash may have stranded: temp base
        writes and base dirs the manifest never published."""
        last = self.last_wave()
        for t in TABLES:
            tdir = os.path.join(self.run_dir, t)
            if not os.path.isdir(tdir):
                continue
            committed_base = self._base_through(t)
            for d in os.listdir(tdir):
                if d.startswith("wave=") and not (
                    committed_base < int(d.split("=")[1]) <= last
                ):
                    # newer than the snapshot (died mid-wave) or already
                    # folded into the base (compaction cleanup died)
                    shutil.rmtree(os.path.join(tdir, d))
                elif d.startswith(".base_tmp"):
                    shutil.rmtree(os.path.join(tdir, d))
                elif d.startswith("base=") and int(d.split("=")[1]) != committed_base:
                    shutil.rmtree(os.path.join(tdir, d))
        bdir = os.path.join(self.run_dir, "bloom")
        if os.path.isdir(bdir):
            bloom_base = self._base_through("bloom")
            for fn in os.listdir(bdir):
                stranded_tmp = fn.startswith(".base_tmp")
                orphan_base = fn.startswith("base=") and fn != f"base={bloom_base}.npy"
                if stranded_tmp or orphan_base:
                    os.remove(os.path.join(bdir, fn))

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
        """Union of the compacted base snapshot (if any) and the committed
        wave partitions above it. Snapshots below the compaction horizon are
        no longer reconstructible (Iceberg snapshot-expiry semantics), so
        ``upto_wave`` below the base's through-wave is rejected."""
        upto = self.last_wave() if upto_wave is None else upto_wave
        through = self._base_through(table)
        if upto < through:
            raise ValueError(
                f"{table}: wave {upto} predates the compaction horizon {through}"
            )
        dirs = []
        if through >= 0 and os.path.isdir(self._base_dir(table, through)):
            dirs.append(self._base_dir(table, through))
        dirs += [
            self._wave_dir(table, w)
            for w in self.committed_waves()
            if through < w <= upto and os.path.isdir(self._wave_dir(table, w))
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
        through = self._base_through("host_state")
        if through >= 0 and os.path.isdir(self._base_dir("host_state", through)):
            return True
        return any(
            os.path.isdir(self._wave_dir("host_state", w))
            for w in self.committed_waves()
        )

    def host_state(self) -> DataFrame:
        """Per-host session state (cookie jar analog, net.go:261-263):
        (host, cookies map). STATE table, not a log — the latest committed
        wave's snapshot is the whole truth (each wave writes the fully
        merged jar), so only that one directory is read."""
        through = self._base_through("host_state")
        for w in sorted(self.committed_waves(), reverse=True):
            if w <= through:
                break  # anything at/below the horizon lives in the base
            d = self._wave_dir("host_state", w)
            if os.path.isdir(d):
                return self.spark.read.parquet(d)
        if through >= 0 and os.path.isdir(self._base_dir("host_state", through)):
            return self.spark.read.parquet(self._base_dir("host_state", through))
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
        """OR of the compacted base (if any) and the per-wave Bloom
        increments above it (None if none)."""
        import numpy as np

        through = self._base_through("bloom")
        out = None
        base = os.path.join(self.run_dir, "bloom", f"base={through}.npy")
        if through >= 0 and os.path.exists(base):
            out = np.load(base)
        for w in self.committed_waves():
            p = self.bloom_path(w)
            if w > through and os.path.exists(p):
                b = np.load(p)
                out = b if out is None else np.bitwise_or(out, b)
        return out

    # -- compaction (Iceberg rewrite_data_files / snapshot-expiry analog) ---

    def compact(self, mode: str = "files", files_per_table: int = 8) -> dict:
        """Fold every committed wave directory into one ``base=<last_wave>``
        snapshot per table. Reads stay correct at every point: the new base
        is written to a temp dir, renamed into place, and only the atomic
        manifest replace publishes it — a crash anywhere before that leaves
        the old snapshot authoritative (stranded temp/base dirs are swept by
        ``rollback_uncommitted`` on the next open).

        ``mode="files"`` is lossless (every table verbatim, fewer dirs/files
        — Iceberg's rewrite_data_files). ``mode="state"`` additionally
        collapses the frontier/consumed log pair into the pending set and
        drops consumed history (the positional-delete compaction + snapshot
        expiry analog): ``pending_frontier()`` and all forward semantics are
        unchanged, but ``fetch_log()`` no longer covers waves at or below
        the horizon. Either way ``bloom_shards`` rows OR-merge to one row
        per shard and the single-bitmap ``bloom`` increments OR-merge to one
        array — the probe unions increments anyway, so merged state is
        semantically identical.

        ``files_per_table`` caps output files per table (coalesce) — sized
        for the sandbox; a cluster compaction would target Iceberg's file
        size instead. Returns {table: through_wave} of what was compacted.

        Multi-session note: compaction is a coordinator action. Another
        session holding the PRE-compaction manifest will try to read wave
        dirs the post-commit cleanup deletes — the same hazard as an
        Iceberg reader pinned to an expired snapshot. Run it from the
        session that owns the crawl, at a wave boundary; concurrent
        sessions recover with ``refresh()`` (a fresh manifest read sees the
        base — test_compact_files_lossless's fresh-store assertions).
        """
        import numpy as np
        import pandas as pd

        if mode not in ("files", "state"):
            raise ValueError(f"unknown compaction mode {mode!r}")
        through = self.last_wave()
        if through < 0:
            return {}
        bases = dict(self.manifest.get("bases", {}))
        done: dict[str, int] = {}
        renames: list[tuple[str, str]] = []
        for t in TABLES:
            if bases.get(t, -1) == through:
                continue  # already compacted through the newest wave
            tdir = os.path.join(self.run_dir, t)
            if not os.path.isdir(tdir):
                continue
            has_rows = any(
                d.startswith(("wave=", "base=")) for d in os.listdir(tdir)
            )
            if not has_rows:
                continue
            if t == "host_state":
                # state table: the newest snapshot is the whole truth
                df = self.host_state()
            elif t == "consumed" and mode == "state":
                df = None  # collapses into the pending-only frontier base
            elif t == "frontier" and mode == "state":
                df = self.pending_frontier()
            elif t == "seen" and mode == "state":
                df = self.read(t).distinct()
            elif t == "bloom_shards":
                shards = self.read(t)

                def _or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
                    bits = None
                    for b in pdf["bits"]:
                        a = np.frombuffer(b, dtype=np.uint8)
                        bits = a.copy() if bits is None else np.bitwise_or(bits, a)
                    return pd.DataFrame(
                        {"shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()]}
                    )

                df = shards.groupBy("shard").applyInPandas(
                    _or_merge, "shard int, bits binary"
                )
            else:
                df = self.read(t)
            tmp = os.path.join(tdir, f".base_tmp{through}")
            if df is not None:
                df.coalesce(files_per_table).write.mode("overwrite").parquet(tmp)
                renames.append((tmp, self._base_dir(t, through)))
            bases[t] = through
            done[t] = through
        # single-bitmap bloom increments (outside TABLES — .npy lifecycle)
        bloom_union = self.load_bloom_union()
        if bloom_union is not None and bases.get("bloom", -1) != through:
            bdir = os.path.join(self.run_dir, "bloom")
            tmp_npy = os.path.join(bdir, f".base_tmp{through}.npy")
            np.save(tmp_npy, bloom_union)
            renames.append((tmp_npy, os.path.join(bdir, f"base={through}.npy")))
            bases["bloom"] = through
            done["bloom"] = through
        if not done:
            return {}
        for tmp, final in renames:
            if os.path.exists(final):  # re-compaction at the same horizon
                shutil.rmtree(final) if os.path.isdir(final) else os.remove(final)
            os.rename(tmp, final)
        # the commit point: until this rename lands, every new path above is
        # unpublished garbage that rollback_uncommitted would sweep
        self.manifest["bases"] = bases
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)
        # post-commit cleanup — crash-safe: read()/host_state()/
        # load_bloom_union ignore anything at or below the horizon, and the
        # next rollback_uncommitted sweeps whatever this loop doesn't reach
        for t in done:
            if t == "bloom":
                bdir = os.path.join(self.run_dir, "bloom")
                for fn in os.listdir(bdir):
                    keep = fn == f"base={through}.npy"
                    if not keep and (fn.startswith("wave=") or fn.startswith("base=")):
                        os.remove(os.path.join(bdir, fn))
                continue
            tdir = os.path.join(self.run_dir, t)
            for d in os.listdir(tdir):
                stale_wave = d.startswith("wave=") and int(d.split("=")[1]) <= through
                stale_base = d.startswith("base=") and int(d.split("=")[1]) != through
                if stale_wave or stale_base:
                    shutil.rmtree(os.path.join(tdir, d))
        return done

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
