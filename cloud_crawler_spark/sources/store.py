"""FrontierStore — snapshotted crawl state with Iceberg-like semantics.

The north rule calls for an Iceberg-table frontier with checkpoint
snapshots and per-partition lineage counters. No Iceberg runtime jar is
present in this sandbox, so the store is an interface with a local
backend: Parquet round-partitioned tables plus an ATOMIC manifest
(write-temp + os.replace) recording which rounds are committed. That
reproduces the Iceberg properties the crawler relies on — immutable
snapshots, atomic multi-table commit per round, resume from any
committed snapshot — and the calls are isolated here so a real Iceberg
catalog backend (`spark.sql.catalog.*=org.apache.iceberg...`) is an
injection point, not a rewrite.

Commit ordering per round mirrors the reference's "mark seen only
after durable store" barrier (crawl_job.rb:102-104,
batch_crawl_job.rb:139-153): crawled append -> seen append -> frontier
snapshot -> lineage append -> manifest flip. A crash anywhere before
the manifest flip resumes cleanly from round k-1 (uncommitted files are
ignored and overwritten).

Tables (all Parquet, partitioned by round / host bucket):
  crawled/round=k    — fetched pages of round k
  seen/round=k       — canon_urls first seen in round k
  frontier/round=k   — FULL pending-frontier snapshot after round k
  lineage/round=k    — per-host-bucket counters (fetched/deduped/deferred/failed)
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRONTIER_SCHEMA = (
    "canon_url string, url string, host string, depth int, referer string, "
    "priority double, round_added int, status string, parent_rank long, link_pos int"
)
SEEN_SCHEMA = "canon_url string"
LINEAGE_SCHEMA = (
    "round int, host_bucket int, fetched long, deduped long, deferred long, failed long"
)


class FrontierStore:
    def __init__(self, spark: SparkSession, base_dir: str, n_host_buckets: int = 64):
        self.spark = spark
        self.base = base_dir
        self.n_host_buckets = n_host_buckets
        os.makedirs(base_dir, exist_ok=True)

    # ------------------------------------------------------------ manifest
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base, "manifest.json")

    def manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"committed_round": -1, "rounds": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    def committed_round(self) -> int:
        return self.manifest()["committed_round"]

    # ------------------------------------------------------------ paths
    def _p(self, table: str, rnd: int) -> str:
        return os.path.join(self.base, table, f"round={rnd}")

    def _write(self, df: DataFrame, table: str, rnd: int) -> None:
        path = self._p(table, rnd)
        if os.path.exists(path):  # stale uncommitted attempt
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(path)

    # ------------------------------------------------------------ round commit
    def commit_round(
        self,
        rnd: int,
        crawled: DataFrame,
        newly_seen: DataFrame,
        frontier: DataFrame,
        lineage: DataFrame,
        stats: dict | None = None,
    ) -> None:
        """Atomically commit one round (ordering per module docstring)."""
        self._write(crawled, "crawled", rnd)
        self._write(newly_seen, "seen", rnd)
        self._write(frontier, "frontier", rnd)
        self._write(lineage, "lineage", rnd)
        m = self.manifest()
        m["rounds"] = [r for r in m["rounds"] if r["round"] < rnd]
        m["rounds"].append({"round": rnd, **(stats or {})})
        m["committed_round"] = rnd
        self._commit_manifest(m)

    def commit_seed(self, frontier: DataFrame, seen: DataFrame) -> None:
        """Round -1: the seeded frontier (before any fetch)."""
        self._write(frontier, "frontier", -1)
        self._write(seen, "seen", -1)
        m = self.manifest()
        m["rounds"] = [{"round": -1}]
        m["committed_round"] = -1
        self._commit_manifest(m)

    # ------------------------------------------------------------ readers
    def frontier(self, rnd: int | None = None) -> DataFrame:
        rnd = self.committed_round() if rnd is None else rnd
        return self.spark.read.schema(FRONTIER_SCHEMA).parquet(self._p("frontier", rnd))

    def seen(self, upto: int | None = None) -> DataFrame:
        """Union of seen deltas for all committed rounds <= upto."""
        upto = self.committed_round() if upto is None else upto
        paths = [
            self._p("seen", r)
            for r in range(-1, upto + 1)
            if os.path.exists(self._p("seen", r))
        ]
        if not paths:
            return self.spark.createDataFrame([], SEEN_SCHEMA)
        return self.spark.read.parquet(*paths).select("canon_url")

    def crawled(self, upto: int | None = None) -> DataFrame:
        upto = self.committed_round() if upto is None else upto
        paths = [
            self._p("crawled", r)
            for r in range(0, upto + 1)
            if os.path.exists(self._p("crawled", r))
        ]
        if not paths:
            raise FileNotFoundError("no crawled rounds committed")
        return self.spark.read.parquet(*paths)

    def lineage(self) -> DataFrame:
        upto = self.committed_round()
        paths = [
            self._p("lineage", r)
            for r in range(0, upto + 1)
            if os.path.exists(self._p("lineage", r))
        ]
        if not paths:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.parquet(*paths)
