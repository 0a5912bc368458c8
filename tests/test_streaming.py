"""Structured Streaming surface: incremental ingest, watermarked
rollups, foreachBatch seen maintenance, applyInPandasWithState
per-host Bloom seen state.

Streaming answers are always checked against the equivalent BATCH
computation on the same data — batch/streaming parity is the oracle.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.sources.corpus import PAGES_SCHEMA
from cloud_crawler_spark.streaming.ingest import (
    hourly_host_rollup,
    parsed_pages_stream,
    per_host_seen_state,
    read_pages_stream,
    streaming_seen_update,
)


def _page_rows(host: str, ids, hour: int = 0):
    ts0 = dt.datetime(2013, 4, 1, hour)
    return [
        (
            f"http://{host}/p{i}",
            ts0 + dt.timedelta(seconds=int(i)),
            f"<html><head><title>t{i}</title></head><body>w{i}</body></html>".encode(),
            f"t{i}w{i}",
            "en",
        )
        for i in ids
    ]


@pytest.fixture()
def pages_dir(spark, tmp_path):
    """Two parquet files = two micro-batches, with URL overlap between
    them (p2/p3 of host a repeat in batch 2)."""
    d = str(tmp_path / "pages")
    b1 = _page_rows("a.example.com", range(4)) + _page_rows("b.example.com", range(2), hour=1)
    b2 = _page_rows("a.example.com", [2, 3, 4, 5], hour=2)
    spark.createDataFrame(b1, PAGES_SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
    spark.createDataFrame(b2, PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(d)
    return d


def test_stream_parse_matches_batch(spark, pages_dir, tmp_path):
    """Stateless canon+parse over the stream == the batch plan's output."""
    stream = parsed_pages_stream(read_pages_stream(spark, pages_dir))
    q = (
        stream.select("canon_url", "title", "page_text")
        .writeStream.format("memory")
        .queryName("parsed_sink")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["canon_url"], r["title"], r["page_text"])
        for r in spark.sql("SELECT * FROM parsed_sink").collect()
    }
    batch = parsed_pages_stream(spark.read.parquet(pages_dir))
    want = {
        (r["canon_url"], r["title"], r["page_text"])
        for r in batch.select("canon_url", "title", "page_text").collect()
    }
    # 10 page rows, but p2/p3 of host a repeat in batch 2 with
    # identical content -> 8 distinct (url, title, text) tuples
    assert got == want and len(got) == 8


def test_hourly_rollup_matches_batch(spark, pages_dir, tmp_path):
    stream = hourly_host_rollup(read_pages_stream(spark, pages_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"], r["host"], r["n_pages"], r["total_bytes"])
        for r in spark.sql("SELECT * FROM rollup_sink").collect()
    }
    want = {
        (r["window"]["start"], r["host"], r["n_pages"], r["total_bytes"])
        for r in hourly_host_rollup(spark.read.parquet(pages_dir)).collect()
    }
    # availableNow + append mode emits only windows closed by the final
    # watermark; every emitted window must match its batch twin, and the
    # first hour (clearly past the watermark) must be present
    assert got <= want
    assert any(w[0] == dt.datetime(2013, 4, 1, 0) for w in got)


def test_streaming_seen_update_incremental(spark, pages_dir, tmp_path):
    """foreachBatch seen maintenance: one file per trigger, the second
    batch appends ONLY urls unseen after the first."""
    seen_dir = str(tmp_path / "seen")
    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=1)
    q = streaming_seen_update(stream, seen_dir, str(tmp_path / "ck3"))
    q.awaitTermination(120)

    seen = spark.read.parquet(seen_dir)
    n = seen.count()
    # 10 page rows but p2/p3 repeat across batches -> 8 distinct urls,
    # and the second batch must NOT have re-appended the repeats
    assert n == seen.dropDuplicates(["canon_url"]).count() == 8

    from cloud_crawler_spark.functions.canon import with_canon

    want = {
        r["canon_url"]
        for r in with_canon(spark.read.parquet(pages_dir), "url").select("canon_url").collect()
    }
    assert {r["canon_url"] for r in seen.collect()} == want


def test_per_host_seen_state_dedups_across_batches(spark, pages_dir, tmp_path):
    """applyInPandasWithState Bloom seen-state: overlapping URLs in a
    later micro-batch count as batch_urls but not batch_new."""
    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=1)
    out = per_host_seen_state(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("seen_state_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM seen_state_sink").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)

    a = sorted(by_host["a.example.com"], key=lambda r: r["total_seen"])
    # batch 1: 4 urls, all new; batch 2: 4 urls, 2 new (p2/p3 repeat)
    assert [r["batch_urls"] for r in a] == [4, 4]
    assert [r["batch_new"] for r in a] == [4, 2]
    assert a[-1]["total_seen"] == 6
    assert by_host["b.example.com"][0]["batch_new"] == 2


def test_streaming_crawl_cross_batch_seen(spark, tmp_path):
    """streaming_crawl: batch 2's seeds that batch 1 already crawled
    are not refetched; output carries each URL exactly once."""
    from cloud_crawler_spark import CrawlConfig
    from cloud_crawler_spark.streaming.ingest import (
        read_seeds_stream, streaming_crawl)
    from tests.helpers import make_corpus

    corpus = make_corpus(spark, {
        "0": {"links": ["1"]}, "1": {"links": ["2"]}, "2": {},
        "4": {"links": ["5"]}, "5": {},
    })
    seeds_dir = tmp_path / "seeds"; seeds_dir.mkdir()
    out_dir = str(tmp_path / "crawled")
    seen_dir = str(tmp_path / "seen")
    ck = str(tmp_path / "ck_crawl")
    cfg = CrawlConfig(depth_limit=2)

    def drop(urls, name):
        spark.createDataFrame(
            [(f"http://www.example.com/{u}", 1.0) for u in urls],
            "url string, priority double",
        ).coalesce(1).write.mode("append").parquet(str(seeds_dir / name))

    # availableNow drains everything present, then stops; a second
    # start with the same checkpoint picks up only the new drop
    drop(["0"], "drop1")
    q = streaming_crawl(corpus, read_seeds_stream(spark, f"{seeds_dir}/*"),
                        out_dir, seen_dir, ck, cfg)
    q.awaitTermination(180)
    got1 = {r["canon_url"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {f"http://www.example.com/{u}" for u in ("0", "1", "2")}

    drop(["1", "4"], "drop2")  # '1' already crawled by batch 1
    q = streaming_crawl(corpus, read_seeds_stream(spark, f"{seeds_dir}/*"),
                        out_dir, seen_dir, ck, cfg)
    q.awaitTermination(180)
    rows = spark.read.parquet(out_dir).collect()
    got = [r["canon_url"] for r in rows]
    assert sorted(set(got)) == sorted(
        f"http://www.example.com/{u}" for u in ("0", "1", "2", "4", "5"))
    assert len(got) == len(set(got))  # nothing fetched twice


def test_session_rollup_stream_matches_batch_and_operator(spark, tmp_path):
    from cloud_crawler_spark.operators.sessions import sessionize
    from cloud_crawler_spark.streaming.ingest import session_rollup

    # user 1: two sessions well clear of the 30-min boundary;
    # user 2: one session; a final late anchor event advances the
    # watermark far enough that availableNow emits everything
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=5)),         # session A
        (1, t0 + dt.timedelta(hours=3)),                    # session B
        (2, t0 + dt.timedelta(minutes=1)),                  # session C
        (99, t0 + dt.timedelta(days=2)),                    # watermark anchor
    ]
    d = str(tmp_path / "sess_events")
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    events.coalesce(1).write.mode("overwrite").parquet(d)

    stream = session_rollup(
        spark.readStream.schema("user_id long, ts timestamp").parquet(d)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("session_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session"]["start"], r["n_events"])
        for r in spark.sql("SELECT * FROM session_sink").collect()
    }
    want = {
        (r["user_id"], r["session"]["start"], r["n_events"])
        for r in session_rollup(spark.read.parquet(d)).collect()
    }
    # append emits only watermark-closed sessions; the anchor's own
    # session may stay open, everything else must have emitted
    assert got <= want
    closed = {g for g in got if g[0] != 99}
    assert closed == {g for g in want if g[0] != 99}

    # cross-check session boundaries against the batch lag operator
    # (identical away from the exact-gap knife edge, as here)
    op = {
        (r["user_id"], r["n_events"])
        for r in sessionize(events, gap_sec=1800).collect()
    }
    assert {(g[0], g[2]) for g in want} == op


def test_session_transitions_stream_matches_batch_operator(spark, tmp_path):
    import datetime as dt

    from cloud_crawler_spark.operators.sessions import transitions
    from cloud_crawler_spark.streaming.ingest import (
        session_transitions_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, t0, 0, "view"), (1, t0 + dt.timedelta(minutes=5), 1, "cart"),
        (1, t0 + dt.timedelta(minutes=6), 2, "buy"),
        (1, t0 + dt.timedelta(hours=3), 3, "view"),   # new session
        (2, t0 + dt.timedelta(minutes=1), 4, "view"),
        (2, t0 + dt.timedelta(minutes=2), 5, "view"),
        (99, t0 + dt.timedelta(days=2), 6, "anchor"),  # watermark anchor
    ]
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    d = str(tmp_path / "trans_events")
    events = spark.createDataFrame(rows, schema)
    events.coalesce(1).write.mode("overwrite").parquet(d)

    stream = session_transitions_stream(
        spark.readStream.schema(schema).parquet(d)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("trans_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_trans"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r["user_id"], r["from_label"], r["to_label"])
        for r in spark.sql("SELECT * FROM trans_sink").collect()
        if r["user_id"] != 99
    ]
    # aggregate emitted steps -> must equal the batch operator's counts
    from collections import Counter

    agg = Counter((f, t) for _, f, t in got)
    want = {
        (r["from_label"], r["to_label"]): r["n_transitions"]
        for r in transitions(events, gap_sec=1800).collect()
    }
    assert dict(agg) == want
    # per-entity step provenance survives (the batch rollup loses it)
    assert (1, "view", "cart") in got and (2, "view", "view") in got
