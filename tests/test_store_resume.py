"""Snapshot store + checkpoint/resume (S9; batch_job.rb:246-268,
spec/batch_job_spec.rb:162-259): kill after round k, resume, final
state identical to an uninterrupted run."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig
from cloud_crawler_spark.plans.crawler import Crawler
from cloud_crawler_spark.sources.store import FrontierStore

from tests.helpers import make_corpus, make_seeds

GRAPH = {
    "0": {"links": ["1", "2"]},
    "1": {"links": ["3", "4"]},
    "2": {"links": ["5"]},
    "3": {}, "4": {}, "5": {},
}
SEEDS = ["http://www.example.com/0"]


def _final_state(res_crawled):
    return sorted(
        (r["canon_url"], r["round"], r["rank"], r["depth"], r["text"])
        for r in res_crawled.collect()
    )


def test_resume_matches_uninterrupted(spark, tmp_path):
    corpus = make_corpus(spark, GRAPH)

    # uninterrupted reference run
    ref = Crawler(spark, corpus, CrawlConfig()).run(make_seeds(spark, SEEDS))
    want = _final_state(ref.crawled)

    # interrupted run: stop after round 1 (max_rounds abuses the bound)
    store_dir = str(tmp_path / "store")
    store = FrontierStore(spark, store_dir)
    c1 = Crawler(spark, corpus, CrawlConfig(max_rounds=2), store)
    c1.run(make_seeds(spark, SEEDS))
    assert store.committed_round() == 1

    # resume from snapshot with a fresh crawler (fresh store handle)
    store2 = FrontierStore(spark, store_dir)
    c2 = Crawler(spark, corpus, CrawlConfig(), store2)
    c2.resume()

    got = _final_state(store2.crawled())
    assert got == want


def test_store_roundtrip_and_lineage(spark, tmp_path):
    corpus = make_corpus(spark, GRAPH)
    store = FrontierStore(spark, str(tmp_path / "s2"))
    res = Crawler(spark, corpus, CrawlConfig(), store).run(make_seeds(spark, SEEDS))

    # crawled readable and matches the in-memory result
    assert store.crawled().count() == res.crawled.count()
    # seen union across rounds == final seen
    assert {r[0] for r in store.seen().collect()} == {r[0] for r in res.seen.collect()}
    # lineage counters present per committed round
    lin = store.lineage()
    assert {r["round"] for r in lin.select("round").distinct().collect()} == set(
        range(store.committed_round() + 1)
    )
    fetched_total = lin.agg(F.sum("fetched")).first()[0]
    assert fetched_total == res.crawled.where("fetched AND code < 400").count()
    # manifest is the commit authority
    m = store.manifest()
    assert m["committed_round"] == len(m["rounds"]) - 2  # rounds include seed round -1


def test_uncommitted_round_is_ignored_on_resume(spark, tmp_path):
    """Crash between table write and manifest flip: the orphan files
    must be ignored (atomicity of the manifest commit)."""
    import os, shutil

    corpus = make_corpus(spark, GRAPH)
    store_dir = str(tmp_path / "s3")
    store = FrontierStore(spark, store_dir)
    Crawler(spark, corpus, CrawlConfig(max_rounds=1), store).run(make_seeds(spark, SEEDS))
    committed = store.committed_round()

    # simulate a crash: round k+1 files exist but manifest not flipped
    fake = os.path.join(store_dir, "crawled", f"round={committed + 1}")
    shutil.copytree(os.path.join(store_dir, "crawled", f"round={committed}"), fake)

    store2 = FrontierStore(spark, store_dir)
    assert store2.committed_round() == committed
    # crawled() only reads committed rounds
    assert store2.crawled().select("round").distinct().count() == committed + 1


# ------------------------------------------------------------ compaction


def _seen_set(df):
    return sorted(r.canon_url for r in df.collect())


def test_compact_preserves_state_and_reduces_dirs(spark, tmp_path):
    corpus = make_corpus(spark, GRAPH)
    store_dir = str(tmp_path / "c1")
    store = FrontierStore(spark, store_dir)
    Crawler(spark, corpus, CrawlConfig(), store).run(make_seeds(spark, SEEDS))

    import os
    before = {
        "seen": _seen_set(store.seen()),
        "seen_r0": _seen_set(store.seen(upto=0)),
        "crawled": sorted((r.canon_url, r.round)
                          for r in store.crawled().collect()),
        "crawled_r1": sorted((r.canon_url, r.round)
                             for r in store.crawled(upto=1).collect()),
        "lineage": sorted((r.round, r.host_bucket, r.fetched)
                          for r in store.lineage().collect()),
    }
    n_dirs_before = sum(
        len(os.listdir(os.path.join(store_dir, t)))
        for t in ("seen", "crawled", "lineage"))
    info = store.compact()
    assert info["upto"] == store.committed_round()
    # merged per-round dirs are gone
    for t in ("seen", "crawled", "lineage"):
        left = os.listdir(os.path.join(store_dir, t)) \
            if os.path.exists(os.path.join(store_dir, t)) else []
        assert left == [], (t, left)
    assert info["removed_dirs"] == n_dirs_before

    # every reader, incl. time travel, is byte-identical
    assert _seen_set(store.seen()) == before["seen"]
    assert _seen_set(store.seen(upto=0)) == before["seen_r0"]
    assert sorted((r.canon_url, r.round)
                  for r in store.crawled().collect()) == before["crawled"]
    assert sorted((r.canon_url, r.round)
                  for r in store.crawled(upto=1).collect()) \
        == before["crawled_r1"]
    assert sorted((r.round, r.host_bucket, r.fetched)
                  for r in store.lineage().collect()) == before["lineage"]


def test_resume_after_compact_matches_uninterrupted(spark, tmp_path):
    corpus = make_corpus(spark, GRAPH)
    ref = Crawler(spark, corpus, CrawlConfig()).run(make_seeds(spark, SEEDS))
    want = _final_state(ref.crawled)

    store_dir = str(tmp_path / "c2")
    store = FrontierStore(spark, store_dir)
    Crawler(spark, corpus, CrawlConfig(max_rounds=2), store).run(
        make_seeds(spark, SEEDS))
    assert store.committed_round() == 1
    store.compact()

    store2 = FrontierStore(spark, store_dir)
    Crawler(spark, corpus, CrawlConfig(), store2).resume()
    assert _final_state(store2.crawled()) == want


def test_compact_incremental_generations(spark, tmp_path):
    corpus = make_corpus(spark, GRAPH)
    store_dir = str(tmp_path / "c3")
    store = FrontierStore(spark, store_dir)
    Crawler(spark, corpus, CrawlConfig(max_rounds=2), store).run(
        make_seeds(spark, SEEDS))
    store.compact()
    g0 = store.manifest()["compaction"]
    assert g0["gen"] == 0 and g0["upto"] == 1

    # more rounds on top of the compacted snapshot
    store2 = FrontierStore(spark, store_dir)
    Crawler(spark, corpus, CrawlConfig(), store2).resume()
    seen_full = _seen_set(store2.seen())
    crawled_full = sorted((r.canon_url, r.round)
                          for r in store2.crawled().collect())

    info = store2.compact()
    assert info["gen"] == 1
    assert _seen_set(store2.seen()) == seen_full
    assert sorted((r.canon_url, r.round)
                  for r in store2.crawled().collect()) == crawled_full
    # old generation cleaned up
    import os
    assert not os.path.exists(
        os.path.join(store_dir, "seen_compact", "gen=0"))


def test_reseed_after_compact_starts_fresh(spark, tmp_path):
    """Re-seeding a compacted store must NOT serve the previous
    crawl's compacted state (review finding: the stale manifest
    compaction entry made seen() return the old crawl's URLs)."""
    corpus = make_corpus(spark, GRAPH)
    store_dir = str(tmp_path / "c4")
    store = FrontierStore(spark, store_dir)
    Crawler(spark, corpus, CrawlConfig(), store).run(make_seeds(spark, SEEDS))
    store.compact()
    old_seen = set(_seen_set(store.seen()))
    assert len(old_seen) == 6  # full crawl of the 6-page graph

    # fresh crawl in the same directory, seeded at the 2-subtree only
    store2 = FrontierStore(spark, store_dir)
    res = Crawler(spark, corpus, CrawlConfig(), store2).run(
        make_seeds(spark, ["http://www.example.com/2"]))
    from tests.helpers import crawled_names
    assert crawled_names(res) == {"2", "5"}

    got = set(_seen_set(store2.seen()))
    # exactly the new crawl's seen set — nothing from the old crawl
    assert got == {u for u in got if u.rstrip("/").endswith(("/2", "/5"))}
    assert len(got) == 2
    assert "compaction" not in store2.manifest()
