"""Adaptive error backoff (CrawlConfig.error_backoff): a host whose
cumulative fetch-failure fraction crosses the threshold gets its
per-round budget clamped — failing hosts stop eating the batch while
still draining at backoff_budget per round. Beyond the reference,
which retries per request (http.rb:211-216) but never adapts the
schedule."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from tests.helpers import make_corpus, make_seeds

_U = "http://www.example.com"
_BAD = "http://dead.example.org"


def _corpus(spark):
    """good host pages 0,1 exist; every dead.example.org URL is a
    corpus miss (code=404, fetched=false — the corpus-mode failure).
    Page 0 links to 4 dead URLs + page 1; page 1 links to 6 more dead
    URLs, so the dead host keeps receiving frontier rows after its
    failure history is established."""
    graph = {
        "0": {"links": ["1"], "hrefs": [f"{_BAD}/x{i}" for i in range(4)]},
        "1": {"hrefs": [f"{_BAD}/y{i}" for i in range(6)]},
    }
    return make_corpus(spark, graph)


def _bad_per_round(res):
    rows = (
        res.crawled.where(F.col("host") == "dead.example.org")
        .groupBy("round")
        .count()
        .collect()
    )
    return {r["round"]: r["count"] for r in rows}


class TestErrorBackoff:
    def test_budget_clamped_after_threshold(self, spark):
        res = crawl(
            spark, _corpus(spark), make_seeds(spark, [f"{_U}/0"]),
            CrawlConfig(outside_domain=True, error_backoff=True,
                        error_backoff_min=3, error_backoff_threshold=0.5,
                        error_backoff_budget=1),
        )
        by_round = _bad_per_round(res)
        # round 1: no failure history yet -> all 4 dead x-URLs attempted
        assert by_round[1] == 4
        # rounds >= 2: history says 4/4 failed -> clamped to 1/round;
        # the 6 y-URLs drain one per round
        later = {k: v for k, v in by_round.items() if k >= 2}
        assert later and all(v == 1 for v in later.values())
        assert sum(later.values()) == 6  # nothing lost, just spread
        # the good host is untouched
        good = (
            res.crawled.where("host = 'www.example.com' AND code = 200").count()
        )
        assert good == 2

    def test_off_by_default_no_clamp(self, spark):
        res = crawl(
            spark, _corpus(spark), make_seeds(spark, [f"{_U}/0"]),
            CrawlConfig(outside_domain=True),
        )
        by_round = _bad_per_round(res)
        assert by_round[1] == 4 and by_round[2] == 6  # all at once

    def test_same_final_url_set_either_way(self, spark):
        cfg_on = CrawlConfig(outside_domain=True, error_backoff=True,
                             error_backoff_min=3, error_backoff_threshold=0.5)
        a = crawl(spark, _corpus(spark), make_seeds(spark, [f"{_U}/0"]), cfg_on)
        b = crawl(spark, _corpus(spark), make_seeds(spark, [f"{_U}/0"]),
                  CrawlConfig(outside_domain=True))
        sa = sorted(r["canon_url"] for r in a.crawled.collect())
        sb = sorted(r["canon_url"] for r in b.crawled.collect())
        assert sa == sb  # backoff reschedules, never drops
