"""Freshness-driven revisit scheduling (operators/revisit.py), seen-set
expiry (operators/seen.expire_seen + cuckoo_delete), the revisit_crawl
facade, and conditional revisit GETs (If-None-Match / If-Modified-Since
-> 304, sources/http_fetch). The scheduler arithmetic is oracle-pinned
end-to-end by queries.q_revisit_schedule; these pin unit semantics and
the crawl integration.

Reference anchor: the recurring driver (driver.rb:214-226 queue.recur)
re-crawls everything uniformly; revisit_crawl is the scale refinement
(change-rate scheduling per Cho & Garcia-Molina, TODS 2003).
"""

from __future__ import annotations

import functools
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl, revisit_crawl
from cloud_crawler_spark.operators.revisit import (
    change_stats,
    due_for_revisit,
    page_validators,
    revisit_priority,
)
from cloud_crawler_spark.operators.seen import (
    build_cuckoo_filters,
    cuckoo_maybe_seen,
    expire_seen,
)
from cloud_crawler_spark.sources.http_fetch import (
    ConditionalTransport,
    HttpFetcher,
)
from tests.helpers import crawled_names, make_corpus, make_seeds

_U = "http://www.example.com"


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def _history(spark):
    """u1: changes every fetch; u2: never changes; u3: single fetch."""
    rows = []
    for k, h in enumerate(["a", "b", "c", "d"]):
        rows.append(("u1", _ts(f"2013-04-0{k + 1} 00:00:00"), h))
    for k in range(4):
        rows.append(("u2", _ts(f"2013-04-0{k + 1} 00:00:00"), "same"))
    rows.append(("u3", _ts("2013-04-01 00:00:00"), "x"))
    return spark.createDataFrame(
        rows, "canon_url string, fetch_ts timestamp, content_hash string"
    )


class TestScheduler:
    def test_change_stats(self, spark):
        s = {r["canon_url"]: r for r in change_stats(_history(spark)).collect()}
        assert s["u1"]["n_changes"] == 3 and s["u1"]["n_intervals"] == 3
        assert s["u2"]["n_changes"] == 0 and s["u2"]["n_intervals"] == 3
        assert s["u3"]["n_changes"] == 0 and s["u3"]["n_intervals"] == 0
        assert s["u1"]["span_sec"] == 3 * 86400

    def test_priority_values(self, spark):
        # now = 2 days after u1/u2's last fetch; cadence = 1 day
        pri = {
            r["canon_url"]: r
            for r in revisit_priority(
                _history(spark), "2013-04-06 00:00:00"
            ).collect()
        }
        # u1: rate (3+1)/(3+2)=0.8; staleness 2d*3/(3d)=2.0 -> 1.6
        assert pri["u1"]["priority"] == pytest.approx(1.6)
        # u2: rate 1/5=0.2; same staleness -> 0.4
        assert pri["u2"]["priority"] == pytest.approx(0.4)
        # u3: no intervals -> rate 1/2, staleness age/86400 = 5 days
        assert pri["u3"]["priority"] == pytest.approx(0.5 * 5.0)
        # the changing page outranks the static one
        assert pri["u1"]["priority"] > pri["u2"]["priority"]

    def test_due_for_revisit_topk(self, spark):
        pri = revisit_priority(_history(spark), "2013-04-06 00:00:00")
        top = [r["canon_url"] for r in due_for_revisit(pri, 2).collect()]
        assert top == ["u3", "u1"]  # 2.5 > 1.6 > 0.4


class TestValidators:
    def test_page_validators_extraction(self, spark):
        pages = spark.createDataFrame(
            [
                ("u1", "u1", "h", {"etag": ['"v1"'], "last-modified": ["Mon"]}),
                ("u2", "u2", "h", {"content-type": ["text/html"]}),
            ],
            "canon_url string, url string, host string, "
            "headers map<string,array<string>>",
        )
        v = {r["canon_url"]: r for r in page_validators(pages).collect()}
        assert v["u1"]["etag"] == '"v1"' and v["u1"]["last_modified"] == "Mon"
        assert v["u2"]["etag"] is None and v["u2"]["last_modified"] is None


class TestConditionalGet:
    def _site(self):
        return {
            f"{_U}/a": {"body": b"<html>A</html>", "etag": '"va"',
                        "last_modified": "Mon, 01 Apr 2013 00:00:00 GMT"},
            f"{_U}/b": {"body": b"<html>B</html>", "etag": '"vb"'},
        }

    def _slice(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, canon_url string, host string, "
            "etag string, last_modified string"
        )

    def test_matching_validator_gets_304(self, spark):
        fetcher = HttpFetcher(
            transport_factory=functools.partial(ConditionalTransport, self._site())
        )
        sl = self._slice(
            spark,
            [
                (f"{_U}/a", f"{_U}/a", "www.example.com", '"va"', None),
                (f"{_U}/b", f"{_U}/b", "www.example.com", '"stale"', None),
            ],
        )
        out = {r["url"]: r for r in fetcher(sl, CrawlConfig()).collect()}
        a, b = out[f"{_U}/a"], out[f"{_U}/b"]
        assert a["code"] == 304 and a["html"] is None and a["fetched"]
        assert a["error"] is None
        assert b["code"] == 200 and bytes(b["html"]) == b"<html>B</html>"

    def test_if_modified_since_and_no_validators(self, spark):
        fetcher = HttpFetcher(
            transport_factory=functools.partial(ConditionalTransport, self._site())
        )
        sl = self._slice(
            spark,
            [
                (f"{_U}/a", f"{_U}/a", "www.example.com", None,
                 "Mon, 01 Apr 2013 00:00:00 GMT"),
                (f"{_U}/b", f"{_U}/b", "www.example.com", None, None),
            ],
        )
        out = {r["url"]: r for r in fetcher(sl, CrawlConfig()).collect()}
        assert out[f"{_U}/a"]["code"] == 304
        assert out[f"{_U}/b"]["code"] == 200

    def test_validators_roundtrip_from_stored_headers(self, spark):
        """Fetch 200s -> stored headers -> page_validators -> refetch
        with those validators -> all 304 (the steady-state revisit)."""
        fetcher = HttpFetcher(
            transport_factory=functools.partial(ConditionalTransport, self._site())
        )
        first = self._slice(
            spark,
            [
                (f"{_U}/a", f"{_U}/a", "www.example.com", None, None),
                (f"{_U}/b", f"{_U}/b", "www.example.com", None, None),
            ],
        )
        stored = fetcher(first, CrawlConfig())
        vals = page_validators(stored.select("canon_url", "url", "host", "headers"))
        again = fetcher(vals, CrawlConfig())
        codes = [r["code"] for r in again.collect()]
        assert codes == [304, 304]


class TestRevisitCrawl:
    def _corpus(self, spark):
        graph = {"0": {"links": ["1", "2"]}, "1": {"links": ["3"]},
                 "2": {}, "3": {}}
        return make_corpus(spark, graph)

    def test_revisit_refetches_only_expired(self, spark):
        corpus = self._corpus(spark)
        res = crawl(spark, corpus, make_seeds(spark, [f"{_U}/0"]), CrawlConfig())
        assert crawled_names(res) == {"0", "1", "2", "3"}
        revisit = spark.createDataFrame([(f"{_U}/1",)], "url string")
        res2, filters2 = revisit_crawl(spark, corpus, res.seen, revisit)
        assert filters2 is None
        # page 1 refetched; its link to 3 is still seen -> not refetched
        assert crawled_names(res2) == {"1"}
        # the revisited URL is seen again afterwards
        assert res2.seen.where(F.col("canon_url") == f"{_U}/1").count() == 1

    def test_revisit_discovers_new_pages(self, spark):
        """A page added to the site since last visit is discovered
        through the revisited page's links."""
        g1 = {"0": {"links": ["1"]}, "1": {}}
        res = crawl(
            spark, make_corpus(spark, g1), make_seeds(spark, [f"{_U}/0"]),
            CrawlConfig(),
        )
        g2 = {"0": {"links": ["1", "9"]}, "1": {}, "9": {}}
        corpus2 = make_corpus(spark, g2)
        revisit = spark.createDataFrame([(f"{_U}/0",)], "url string")
        res2, _ = revisit_crawl(spark, corpus2, res.seen, revisit)
        assert crawled_names(res2) == {"0", "9"}  # 1 still seen

    def test_revisit_keeps_cuckoo_filters_in_sync(self, spark):
        corpus = self._corpus(spark)
        res = crawl(spark, corpus, make_seeds(spark, [f"{_U}/0"]), CrawlConfig())
        seen = res.seen.localCheckpoint(eager=True)
        filters = build_cuckoo_filters(seen).cache()
        revisit = spark.createDataFrame([(f"{_U}/2",)], "url string")
        res2, filters2 = revisit_crawl(
            spark, corpus, seen, revisit, filters=filters
        )
        assert crawled_names(res2) == {"2"}
        probed = {
            r["canon_url"]: r["maybe_seen"]
            for r in cuckoo_maybe_seen(seen, filters2).collect()
        }
        assert probed[f"{_U}/2"] is False  # expired from the filter
        assert probed[f"{_U}/0"] and probed[f"{_U}/1"] and probed[f"{_U}/3"]

    def test_expire_seen_without_filters(self, spark):
        seen = spark.createDataFrame(
            [("a",), ("b",), ("c",)], "canon_url string"
        )
        expired = spark.createDataFrame([("b",)], "canon_url string")
        s2, f2 = expire_seen(seen, expired)
        assert f2 is None
        assert sorted(r["canon_url"] for r in s2.collect()) == ["a", "c"]
