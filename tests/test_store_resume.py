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
