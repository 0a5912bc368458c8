"""Structured Streaming surface: incremental page ingest.

The reference's driver loop is batch-round-structured (SURVEY.md §3),
but its *recurring job source* (S10, driver.rb:214-226 `queue.recur`)
and the continuously-arriving nature of a real Common-Crawl-style
corpus map naturally onto Structured Streaming:

* `read_pages_stream`   — `readStream` over a parquet directory of
  pages(url, warc_ts, html, text, lang) — new WARC dumps appear as new
  files and are picked up incrementally.
* `parsed_pages_stream` — the SAME vectorized canon/parse pandas UDFs
  the batch rounds use, applied to the stream (stateless projection —
  identical plan fragment, so batch/streaming parity is structural).
* `hourly_host_rollup`  — watermarked tumbling-window aggregation of
  crawl metrics per host; late pages within the watermark are folded
  in, older ones dropped (A1/A5 counters, streaming-grade).
* `streaming_seen_update` — `foreachBatch` incremental URL-seen
  maintenance: each micro-batch anti-joins the persistent seen table
  and appends only new canon_urls — the streaming twin of the crawl
  round's D1-D3 mark-seen step. Retry idempotency comes from that
  anti-join: a replayed micro-batch finds its rows already appended
  and appends nothing. (A crash BETWEEN a partial append commit and
  the checkpoint commit can briefly expose duplicate canon_urls to
  external readers of seen_dir; `read_seen` below is the
  duplicate-safe reader.)
* `per_host_seen_state` — `applyInPandasWithState` custom stateful
  operator: per-host Bloom filter (fixed-size binary state, the same
  double-hash scheme as operators/seen.py) tracking URLs seen across
  micro-batches — bounded state per host at any frontier scale.
* `streaming_crawl` — foreachBatch continuous crawling: each seed
  micro-batch runs a bounded BFS crawl whose seen set is seeded from
  the persistent cross-batch store (store-then-mark ordering), so
  at-least-once seed delivery becomes effectively-once fetching.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cloud_crawler_spark.functions.canon import with_canon
from cloud_crawler_spark.functions.parse import with_parsed
from cloud_crawler_spark.sources.corpus import PAGES_SCHEMA

__all__ = [
    "read_pages_stream",
    "parsed_pages_stream",
    "hourly_host_rollup",
    "streaming_seen_update",
    "read_seen",
    "per_host_seen_state",
    "read_seeds_stream",
    "streaming_crawl",
]


def read_pages_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a directory of pages parquet files."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory)


def parsed_pages_stream(pages: DataFrame) -> DataFrame:
    """Canonicalize + parse a (streaming or batch) pages DataFrame with
    the same vectorized UDFs the batch crawl rounds use (P1-P5)."""
    return with_parsed(with_canon(pages, "url"), "html")


def hourly_host_rollup(
    pages: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window crawl-rate metrics per host.

    Output: window STRUCT<start,end>, host, n_pages, total_bytes.
    Late pages within `watermark` of the max event time are folded into
    their window; anything later is dropped — bounded state, any scale.
    """
    p = with_canon(pages, "url")
    return (
        p.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("window"), F.col("host"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.octet_length("html")).alias("total_bytes"),
        )
    )


def _try_read_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet directory or return None if it doesn't exist yet.
    Goes through Spark's own filesystem layer (schema inference reads
    the footers at call time), so it works for hdfs://, s3a://, etc. —
    a driver-local os.path.exists would silently report 'missing' for
    any non-local store and turn every batch into a full re-crawl."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def streaming_seen_update(
    pages: DataFrame, seen_dir: str, checkpoint_dir: str
):
    """foreachBatch incremental URL-seen maintenance.

    Each micro-batch: canon -> distinct -> anti-join the persistent
    seen parquet at `seen_dir` -> append the genuinely-new canon_urls.
    Returns the StreamingQuery (caller awaits/stops it).
    """

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = (
            with_canon(batch_df, "url")
            .select("canon_url")
            .where(F.col("canon_url").isNotNull())
            .dropDuplicates(["canon_url"])
        )
        seen = _try_read_parquet(spark, seen_dir)
        if seen is not None:
            new = new.join(seen, "canon_url", "left_anti")
        new.write.mode("append").parquet(seen_dir)

    return (
        pages.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_seen(spark: SparkSession, seen_dir: str) -> DataFrame:
    """Duplicate-safe reader for the seen table maintained by
    streaming_seen_update: a crash between a partial append commit and
    the checkpoint commit can leave duplicate canon_urls on disk, so
    external readers go through dropDuplicates here."""
    return spark.read.parquet(seen_dir).dropDuplicates(["canon_url"])


# ------------------------------------------------------ stateful operator

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
        T.StructField("bloom", T.BinaryType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("batch_urls", T.LongType()),
        T.StructField("batch_new", T.LongType()),
        T.StructField("total_seen", T.LongType()),
    ]
)

_BLOOM_M_BITS = 1 << 17  # 16 KiB per host — bounded state at any scale
_BLOOM_HASHES = 7        # matches the reference (redis_url_bloomfilter.rb:47)


def _probe_and_set(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> int:
    """Vectorized Bloom probe+insert (same double-hash scheme as
    operators/seen.py): returns the number of NEW keys, sets their bits.

    The probe runs against the PRE-insert bit array, so duplicate keys
    within one call would each count as new — dedupe (h1, h2) pairs
    first so batch_new counts distinct new URLs."""
    pairs = np.unique(np.stack([h1, h2], axis=1), axis=0)
    h1, h2 = pairs[:, 0], pairs[:, 1]
    step = h1 | np.uint64(1)
    seen = np.ones(len(h1), dtype=bool)
    idxs = []
    for i in range(_BLOOM_HASHES):
        idx = (h2 + np.uint64(i) * step) % np.uint64(_BLOOM_M_BITS)
        idxs.append(idx)
        seen &= (bits[(idx // 8).astype(np.int64)] & (1 << (idx % 8)).astype(np.uint8)) != 0
    new = ~seen
    for idx in idxs:
        np.bitwise_or.at(
            bits, (idx[new] // 8).astype(np.int64), (1 << (idx[new] % 8)).astype(np.uint8)
        )
    return int(new.sum())


def _seen_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_seen, blob = state.get
        bits = np.frombuffer(blob, dtype=np.uint8).copy()
    else:
        n_seen, bits = 0, np.zeros(_BLOOM_M_BITS // 8, dtype=np.uint8)

    batch_urls = 0
    batch_new = 0
    for pdf in pdfs:
        batch_urls += len(pdf)
        h1 = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        h2 = pdf["url_hash2"].to_numpy(dtype=np.int64).view(np.uint64)
        batch_new += _probe_and_set(bits, h1, h2)

    n_seen += batch_new
    state.update((n_seen, bits.tobytes()))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "batch_urls": [batch_urls],
            "batch_new": [batch_new],
            "total_seen": [n_seen],
        }
    )


def per_host_seen_state(pages: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-host Bloom URL-seen set.

    Input: streaming pages (or any DF with a url column). Output per
    micro-batch per host: (host, batch_urls, batch_new, total_seen).
    State is a fixed 16 KiB Bloom per host — the applyInPandasWithState
    realization of the north rule's partitioned URL-seen filter.
    """
    from cloud_crawler_spark.operators.seen import with_url_hash

    hashed = with_url_hash(
        with_canon(pages, "url").where(F.col("canon_url").isNotNull())
    ).select("host", "url_hash", "url_hash2")
    return hashed.groupBy("host").applyInPandasWithState(
        _seen_state_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------ streaming crawl


def read_seeds_stream(spark: SparkSession, directory: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over a directory of seeds parquet files
    (url [, priority]) — new seed drops appear as new files."""
    r = spark.readStream.schema("url string, priority double")
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(directory)


def streaming_crawl(
    corpus,
    seeds_stream: DataFrame,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    config=None,
):
    """Continuous crawling: each seed micro-batch triggers a bounded
    BFS crawl (plans/crawler.crawl) whose seen set is seeded from the
    persistent cross-batch store, so URLs crawled by ANY earlier batch
    are never refetched — the streaming-native form of the reference's
    recurring source (S10) composed with its mark-seen ordering (D3):

      * crawled pages append to `out_dir` (idempotent per canon_url
        for downstream dedup-safe readers);
      * the batch's newly-seen canon_urls append to `seen_dir` AFTER
        the page append (store-then-mark, crawl_job.rb:102-104
        ordering) — a replayed micro-batch re-crawls at most its own
        batch and re-appends the same canon_urls, which `read_seen`
        collapses;
      * Spark's streaming checkpoint (offsets in `checkpoint_dir`)
        makes seed files at-least-once; the seen anti-join turns that
        into effectively-once fetching.

    Returns the StreamingQuery (caller awaits/stops it)."""
    from cloud_crawler_spark.plans.crawler import crawl

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        seeds = batch_df.select("url").where(F.col("url").isNotNull()).distinct()
        if seeds.isEmpty():
            return
        prev = _try_read_parquet(spark, seen_dir)
        if prev is not None:
            prev = prev.dropDuplicates(["canon_url"])  # read_seen semantics
        res = crawl(spark, corpus, seeds, config, initial_seen=prev)
        crawled = res.crawled
        if crawled.isEmpty():
            return
        crawled.select(
            "canon_url", "url", "depth", "code", "referer"
        ).write.mode("append").parquet(out_dir)
        new_seen = res.seen.select("canon_url")
        if prev is not None:
            new_seen = new_seen.join(prev, "canon_url", "left_anti")
        new_seen.write.mode("append").parquet(seen_dir)

    return (
        seeds_stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked SESSION-window aggregation — the streaming twin of
    operators/sessions.sessionize, on Spark's built-in session_window
    (merge events whose [t, t+gap) windows overlap) instead of the
    batch lag/running-sum windows. State is bounded by the watermark:
    a session closes (and emits, in append mode) once the watermark
    passes its end, so per-entity state never outlives gap+watermark.

    Output: session STRUCT<start,end>, entity, n_events. Boundary
    nuance vs the batch operator: an event exactly `gap` after its
    predecessor starts a NEW session here ([t, t+gap) half-open
    merge), while the batch rule `gap <= timeout` keeps it — equal
    only away from that knife edge, which is where real data lives.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(entity_col),
        )
        .agg(F.count("*").alias("n_events"))
    )


def session_transitions_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    label_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of operators/sessions.transitions: per-session
    (from_label -> to_label) step rows, emitted append-mode once the
    watermark closes the session. ONE stateful operator (the
    session_window collect) — chained streaming aggregations carry
    correctness restrictions, so the global rollup stays downstream
    (sum the emitted per-step rows in batch or with a second job).

    Output: one row per consecutive in-session step —
    (entity, session STRUCT<start,end>, from_label, to_label).
    Within-session order is (ts, id), matching the batch operator;
    the session-boundary nuance vs the batch gap rule is
    session_rollup's (half-open window merge vs `gap <=`).

    Scale shape: state per (entity, open session) is the event list
    — bounded by watermark horizon x per-entity event rate (cap
    pathological entities upstream if that product is unbounded);
    pair derivation is codegen zip_with over shifted slices of the
    already-aggregated array, stateless.
    """
    collected = (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(entity_col),
        )
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("_ts"),
                        F.col(id_col).alias("_id"),
                        F.col(label_col).alias("_lbl"),
                    )
                )
            ).alias("_seq")
        )
    )
    n1 = F.greatest(F.size("_seq") - 1, F.lit(0))
    steps = F.zip_with(
        F.slice(F.col("_seq"), 1, n1),
        F.slice(F.col("_seq"), 2, n1),
        lambda a, b: F.struct(
            a["_lbl"].alias("from_label"), b["_lbl"].alias("to_label")
        ),
    )
    return collected.select(
        entity_col,
        "session",
        F.explode(steps).alias("_s"),
    ).select(
        entity_col,
        "session",
        F.col("_s.from_label").alias("from_label"),
        F.col("_s.to_label").alias("to_label"),
    )
