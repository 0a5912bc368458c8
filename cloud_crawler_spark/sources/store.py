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
        """Round -1: the seeded frontier (before any fetch). Re-seeding
        an existing store starts a FRESH crawl: the manifest drops any
        compaction entry (else readers would serve the previous
        crawl's compacted rounds) and stale compacted dirs go away."""
        self._write(frontier, "frontier", -1)
        self._write(seen, "seen", -1)
        m = self.manifest()
        m["rounds"] = [{"round": -1}]
        m["committed_round"] = -1
        m.pop("compaction", None)
        self._commit_manifest(m)
        for table in ("seen", "crawled", "lineage"):
            croot = os.path.join(self.base, f"{table}_compact")
            if os.path.exists(croot):
                shutil.rmtree(croot)

    # ------------------------------------------------------------ readers
    def frontier(self, rnd: int | None = None) -> DataFrame:
        rnd = self.committed_round() if rnd is None else rnd
        return self.spark.read.schema(FRONTIER_SCHEMA).parquet(self._p("frontier", rnd))

    def _compaction(self) -> dict | None:
        return self.manifest().get("compaction")

    def _compact_path(self, table: str, gen: int) -> str:
        return os.path.join(self.base, f"{table}_compact", f"gen={gen}")

    def _delta_start(self, comp: dict | None) -> int:
        """First round NOT covered by the compacted snapshot. Rounds at
        or below comp['upto'] are read from the compacted table ONLY —
        leftover per-round dirs (a crash between manifest flip and
        cleanup) are ignored, never double-counted."""
        return (comp["upto"] + 1) if comp else None  # type: ignore[return-value]

    def _read_with_compaction(self, table: str, upto: int,
                              floor: int) -> DataFrame | None:
        """Union of `table`'s compacted snapshot (rows filtered to
        round <= upto) and the per-round delta dirs newer than the
        compaction. Rounds covered by the compaction are read from it
        ONLY — leftover delta dirs (a crash between manifest flip and
        cleanup) are ignored, never double-counted. Returns None when
        the table has no data at all."""
        comp = self._compaction()
        frames = []
        start = floor
        if comp is not None:
            cpath = self._compact_path(table, comp["gen"])
            if os.path.exists(cpath):
                cdf = self.spark.read.parquet(cpath)
                frames.append(cdf.where(F.col("round") <= upto))
            start = max(floor, comp["upto"] + 1)
        paths = [
            self._p(table, r)
            for r in range(start, upto + 1)
            if os.path.exists(self._p(table, r))
        ]
        if paths:
            raw = self.spark.read.parquet(*paths)
            if frames:  # align schemas: deltas lack the round column
                raw = raw.select(*[c for c in frames[0].columns
                                   if c in raw.columns])
                frames = [f.select(raw.columns) for f in frames]
            frames.append(raw)
        if not frames:
            return None
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def seen(self, upto: int | None = None) -> DataFrame:
        """Union of seen deltas for all committed rounds <= upto."""
        upto = self.committed_round() if upto is None else upto
        out = self._read_with_compaction("seen", upto, -1)
        if out is None:
            return self.spark.createDataFrame([], SEEN_SCHEMA)
        return out.select("canon_url")

    def crawled(self, upto: int | None = None) -> DataFrame:
        upto = self.committed_round() if upto is None else upto
        out = self._read_with_compaction("crawled", upto, 0)
        if out is None:
            raise FileNotFoundError("no crawled rounds committed")
        return out

    def lineage(self) -> DataFrame:
        out = self._read_with_compaction("lineage", self.committed_round(), 0)
        if out is None:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return out

    # ------------------------------------------------------------ compaction
    def compact(self, coalesce_to: int = 4) -> dict:
        """Small-file compaction (Iceberg rewrite_data_files analogue):
        merge the per-round seen/crawled/lineage delta directories —
        one per committed round, each with its own task-count of part
        files — into ONE compacted snapshot per table, atomically via
        the manifest, then delete the merged inputs.

        Every row keeps its `round` (seen deltas get it tagged from
        their directory), so time travel — `seen(upto=k)`,
        `crawled(upto=k)`, and therefore `CrawlDriver.resume()` at any
        snapshot — is unchanged: readers filter the compacted table on
        round and union only the deltas newer than the compaction.

        Why it matters at scale: a 10^4-round crawl leaves 3x10^4
        directories whose open/list cost dominates every resume and
        every seen() union; compaction bounds the file count without
        a write amplification spiral (each compact rewrites the
        already-compacted generation once, plus the new deltas).

        Crash safety mirrors commit_round: write the new generation,
        flip the manifest (os.replace), THEN clean up. A crash before
        the flip leaves a stale gen directory that the next attempt
        overwrites; a crash after it leaves stale delta dirs that
        readers already ignore (see _delta_start) and the next
        compact() removes.

        Returns {"gen", "upto", "removed_dirs"}.
        """
        upto = self.committed_round()
        m = self.manifest()
        prev = m.get("compaction")
        gen = (prev["gen"] + 1) if prev else 0
        start = (prev["upto"] + 1) if prev else -1

        def delta_dirs(table: str, lo: int):
            return [
                (r, self._p(table, r))
                for r in range(lo, upto + 1)
                if os.path.exists(self._p(table, r))
            ]

        plans = {
            "seen": [
                self.spark.read.parquet(p).select("canon_url")
                .withColumn("round", F.lit(r).cast("int"))
                for r, p in delta_dirs("seen", max(start, -1))
            ],
            "crawled": [
                self.spark.read.parquet(p)
                for _, p in delta_dirs("crawled", max(start, 0))
            ],
            "lineage": [
                self.spark.read.parquet(p)
                for _, p in delta_dirs("lineage", max(start, 0))
            ],
        }
        for table, parts in plans.items():
            if prev is not None:
                old = self.spark.read.parquet(
                    self._compact_path(table, prev["gen"]))
                parts = [old] + parts
            path = self._compact_path(table, gen)
            if os.path.exists(path):  # stale uncommitted attempt
                shutil.rmtree(path)
            if parts:
                out = parts[0]
                for f in parts[1:]:
                    out = out.unionByName(f)
                out.coalesce(coalesce_to).write.mode("overwrite").parquet(path)
            # no parts at all (e.g. compact before any round): write no
            # dir — readers treat a missing compact dir as empty

        m["compaction"] = {"gen": gen, "upto": upto}
        self._commit_manifest(m)

        removed = 0
        for table in ("seen", "crawled", "lineage"):
            for r in range(-1, upto + 1):
                p = self._p(table, r)
                if os.path.exists(p):
                    shutil.rmtree(p)
                    removed += 1
            # every generation below the committed one goes — incl.
            # pre-previous gens a crash between a past manifest flip
            # and its cleanup left behind
            croot = os.path.join(self.base, f"{table}_compact")
            if os.path.isdir(croot):
                for d in os.listdir(croot):
                    if d.startswith("gen=") and int(d[4:]) < gen:
                        shutil.rmtree(os.path.join(croot, d))
                        removed += 1
        return {"gen": gen, "upto": upto, "removed_dirs": removed}

    # ------------------------------------------------------------ doc store
    # S8 (redis_doc_store.rb:35-139 via batch_api_job.rb:35-40): JSON
    # documents keyed by canonical URL, appended per round alongside
    # the page tables.
    def commit_docs(self, rnd: int, docs: DataFrame) -> None:
        """Append JSON docs for round `rnd`. `docs` needs a canon_url
        column; every other column is packed into one JSON string per
        row (the reference's doc-store value)."""
        payload = docs.select(
            "canon_url",
            F.to_json(F.struct(*[c for c in docs.columns if c != "canon_url"])).alias(
                "doc_json"
            ),
        )
        self._write(payload, "docs", rnd)

    def docs(self, upto: int | None = None) -> DataFrame:
        """Union of committed doc rounds <= upto: (canon_url, doc_json)."""
        upto = self.committed_round() if upto is None else upto
        paths = [
            self._p("docs", r)
            for r in range(0, upto + 1)
            if os.path.exists(self._p("docs", r))
        ]
        if not paths:
            return self.spark.createDataFrame([], "canon_url string, doc_json string")
        return self.spark.read.parquet(*paths)


class IcebergFrontierStore(FrontierStore):
    """The real-Iceberg backend behind the same FrontierStore surface.

    Activated by config when an Iceberg catalog is on the classpath
    (no runtime jar ships in this sandbox, so __init__ verifies the
    catalog and fails fast with the exact spark-submit flags needed).
    Tables live under ``<catalog>.<namespace>`` and every reader/writer
    routes through Spark SQL on the catalog, giving the crawler real
    snapshot isolation + time travel in place of the local manifest:

      crawled/seen/frontier/lineage — partitioned by `round` (frontier
      additionally bucket(n_host_buckets, host) for per-round partition
      pruning on the politeness window's host scan)
      manifest           — single-row commit pointer; the atomic flip
                           is the Iceberg commit of that one-row
                           overwrite, replacing os.replace()

    Usage on a cluster:
      spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
        --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.crawl.type=hadoop \
        --conf spark.sql.catalog.crawl.warehouse=<path> ...
    then ``make_store(spark, backend="iceberg", catalog="crawl")``.
    """

    _TABLES = {
        "crawled": None,   # schema from first append
        "seen": SEEN_SCHEMA,
        "frontier": FRONTIER_SCHEMA,
        "lineage": LINEAGE_SCHEMA,
    }

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "crawl",
                 n_host_buckets: int = 64):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.n_host_buckets = n_host_buckets
        try:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        except Exception:
            impl = None
        if not impl:
            raise RuntimeError(
                f"Iceberg catalog '{catalog}' is not configured. Launch with "
                f"--conf spark.sql.catalog.{catalog}=org.apache.iceberg.spark.SparkCatalog "
                f"and the iceberg-spark-runtime package (see class docstring), "
                f"or use the local backend: make_store(spark, base_dir=...)."
            )
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._t('frontier')} "
            f"({FRONTIER_SCHEMA}, round INT) USING iceberg "
            f"PARTITIONED BY (round, bucket({n_host_buckets}, host))"
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._t('seen')} "
            f"({SEEN_SCHEMA}, round INT) USING iceberg PARTITIONED BY (round)"
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._t('lineage')} "
            f"({LINEAGE_SCHEMA}) USING iceberg PARTITIONED BY (round)"
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._t('manifest')} "
            f"(committed_round INT, next_rank LONG, crawled LONG) USING iceberg"
        )

    def _t(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    # -- manifest: the commit pointer is one Iceberg row; overwriting it
    # is atomic because the Iceberg table commit is
    def manifest(self) -> dict:
        rows = self.spark.table(self._t("manifest")).collect()
        if not rows:
            return {"committed_round": -1, "rounds": []}
        r = rows[0]
        return {
            "committed_round": r["committed_round"],
            "rounds": [{"round": r["committed_round"], "next_rank": r["next_rank"]}],
        }

    def commit_round(self, rnd, crawled, newly_seen, frontier, lineage, stats=None):
        """REPLACE round `rnd`'s partition in every table, then flip
        the manifest — `overwritePartitions()` (Iceberg dynamic
        partition overwrite, atomic per table) instead of `append()`,
        so the crash-retry idempotence the contract suite pins
        (tests/test_store_contract.py test_recommit_round_replaces)
        holds: a resumed driver redoing the round that never flipped
        the manifest cannot double that round's rows."""
        stats = stats or {}
        crawled_r = crawled.withColumn("round", F.lit(rnd))
        if self.spark.catalog.tableExists(self._t("crawled")):
            crawled_r.writeTo(self._t("crawled")).overwritePartitions()
        else:  # crawled schema is config-dependent: create from first append
            crawled_r.writeTo(self._t("crawled")).using("iceberg").partitionedBy(
                F.col("round")
            ).create()
        newly_seen.withColumn("round", F.lit(rnd)).writeTo(
            self._t("seen")).overwritePartitions()
        frontier.withColumn("round", F.lit(rnd)).writeTo(
            self._t("frontier")).overwritePartitions()
        # lineage rows carry their own `round` column (the partition
        # key), so dynamic overwrite replaces exactly round `rnd`
        lineage.writeTo(self._t("lineage")).overwritePartitions()
        self.spark.sql(
            f"INSERT OVERWRITE {self._t('manifest')} "
            f"VALUES ({rnd}, {int(stats.get('next_rank', 1))}, {int(stats.get('crawled', 0))})"
        )

    def commit_seed(self, frontier, seen):
        """Re-seeding starts a FRESH crawl (same contract as the local
        backend): clear every table of the previous crawl's rounds,
        then write the round -1 snapshot and flip the manifest."""
        for t in ("frontier", "seen", "lineage"):
            self.spark.sql(f"DELETE FROM {self._t(t)}")
        if self.spark.catalog.tableExists(self._t("crawled")):
            self.spark.sql(f"DELETE FROM {self._t('crawled')}")
        frontier.withColumn("round", F.lit(-1)).writeTo(self._t("frontier")).append()
        seen.withColumn("round", F.lit(-1)).writeTo(self._t("seen")).append()
        self.spark.sql(f"INSERT OVERWRITE {self._t('manifest')} VALUES (-1, 1, 0)")

    def frontier(self, rnd=None):
        rnd = self.committed_round() if rnd is None else rnd
        return self.spark.table(self._t("frontier")).where(F.col("round") == rnd).drop("round")

    def seen(self, upto=None):
        upto = self.committed_round() if upto is None else upto
        return (
            self.spark.table(self._t("seen"))
            .where(F.col("round") <= upto)
            .select("canon_url")
        )

    def crawled(self, upto=None):
        upto = self.committed_round() if upto is None else upto
        # parity with the local backend's reader contract: before any
        # crawl round is committed (fresh seed / re-seed) this raises
        # rather than returning an empty frame
        if upto < 0 or not self.spark.catalog.tableExists(self._t("crawled")):
            raise FileNotFoundError("no crawled rounds committed")
        return self.spark.table(self._t("crawled")).where(F.col("round") <= upto)

    def lineage(self):
        return self.spark.table(self._t("lineage"))


def make_store(
    spark: SparkSession,
    base_dir: str | None = None,
    backend: str = "local",
    catalog: str = "crawl",
    namespace: str = "crawl",
    n_host_buckets: int = 64,
) -> FrontierStore:
    """Config-driven store selection (SURVEY §7): 'local' = parquet +
    manifest snapshots (this sandbox), 'iceberg' = catalog-backed."""
    if backend == "iceberg":
        return IcebergFrontierStore(spark, catalog, namespace, n_host_buckets)
    if backend == "local":
        if base_dir is None:
            raise ValueError("local backend requires base_dir")
        return FrontierStore(spark, base_dir, n_host_buckets)
    raise ValueError(f"unknown store backend: {backend!r}")
