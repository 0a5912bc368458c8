"""Redirect-edge semantics pinned after the r5 engine review:

1. DEAD-END chains (cross-host target) with keep_redirects=False are
   RECORDED — stored as a terminal 301 and marked seen — instead of
   silently vanishing and being re-fetched on every rediscovery.
2. Two chains landing on the SAME canon within a round yield ONE
   crawled row (first by crawl order), as the in-code first-occurrence
   comment always promised.
3. A chain landing on an ALREADY-SEEN canon re-fetches (reference-
   faithful) but never duplicates the seen set.
"""

from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl

from tests.helpers import make_corpus, make_seeds

SEED = ["http://www.example.com/0"]


def _rows_for(res, name):
    return res.crawled.where(
        F.col("canon_url") == f"http://www.example.com/{name}"
    ).collect()


def test_crosshost_deadend_recorded_without_keep_redirects(spark):
    graph = {
        "0": {"links": ["1", "2"]},
        "1": {"redirect_to": "http://othersite.com/x"},
        "2": {"links": ["1"]},  # rediscovers the dead-end
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig(keep_redirects=False))
    rows = _rows_for(res, "1")
    # exactly one terminal 301 row — recorded once, never re-fetched
    assert len(rows) == 1
    r = rows[0]
    assert r["code"] == 301 and r["fetched"]
    assert r["redirect_to"] == "http://othersite.com/x"
    # and it is in the seen set, so rediscovery via page 2 dedupes
    assert res.seen.where(
        F.col("canon_url") == "http://www.example.com/1"
    ).count() == 1


def test_same_round_duplicate_landings_keep_first(spark):
    graph = {
        "0": {"links": ["1", "2"]},
        "1": {"redirect_to": "http://www.example.com/3"},
        "2": {"redirect_to": "http://www.example.com/3"},
        "3": {},
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig())
    rows = _rows_for(res, "3")
    assert len(rows) == 1  # A and B both 301 -> C: one stored C row
    assert rows[0]["code"] == 200
    # first occurrence by crawl order: via parent link position 0 (p1)
    assert res.seen.where(
        F.col("canon_url") == "http://www.example.com/3"
    ).count() == 1
    # the kept-301 hop rows for both chain heads still exist
    assert len(_rows_for(res, "1")) == 1
    assert len(_rows_for(res, "2")) == 1


def test_cross_round_landing_on_seen_does_not_duplicate_seen(spark):
    graph = {
        "0": {"links": ["3", "1"]},
        "3": {},
        "1": {"links": ["2"]},
        "2": {"redirect_to": "http://www.example.com/3"},
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig())
    # seen is a SET: one row per canon, even though round 2's chain
    # re-landed on the round-1-seen page 3
    dup = (
        res.seen.groupBy("canon_url").count().where(F.col("count") > 1)
    )
    assert dup.count() == 0
    assert res.seen.where(
        F.col("canon_url") == "http://www.example.com/3"
    ).count() == 1
