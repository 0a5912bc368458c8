"""Live robots.txt fetch + gating (Robotex parity, dsl_core.rb:237-241).

The reference's `allowed` predicate fetches each host's robots.txt via
the Robotex gem on first use and `rescue -> false` turns a robots
FAILURE into "disallowed". These tests pin the BSP analog:
operators/robots.fetch_robots + the per-round refresh hook wired by
CrawlConfig(live_robots=True).
"""

from __future__ import annotations

import functools

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.operators.robots import build_rules, fetch_robots
from cloud_crawler_spark.sources.http_fetch import DictTransport, HttpFetcher
from tests.helpers import make_corpus, make_seeds

_U = "http://www.example.com"


def _site(robots_body: str | None):
    site = {
        f"{_U}/0": {
            "code": 200,
            "body": (b"<html><a href='/keep'>a</a>"
                     b"<a href='/private/x'>b</a></html>"),
            "content_type": "text/html",
        },
        f"{_U}/keep": {"code": 200, "body": b"<html>k</html>",
                       "content_type": "text/html"},
        f"{_U}/private/x": {"code": 200, "body": b"<html>p</html>",
                            "content_type": "text/html"},
    }
    if robots_body is not None:
        site[f"{_U}/robots.txt"] = {
            "code": 200, "body": robots_body.encode(),
            "content_type": "text/plain",
        }
    return site


class TestFetchRobots:
    def test_served_body_collected(self, spark):
        site = _site("User-agent: *\nDisallow: /private")
        hosts = spark.createDataFrame([("www.example.com",)], "host string")
        got = fetch_robots(
            hosts, functools.partial(DictTransport, site)
        ).collect()
        assert len(got) == 1
        assert "Disallow: /private" in got[0]["body"]

    def test_missing_robots_yields_no_row(self, spark):
        hosts = spark.createDataFrame([("www.example.com",)], "host string")
        got = fetch_robots(
            hosts, functools.partial(DictTransport, _site(None))
        ).collect()
        assert got == []  # 404 => allow-all (no rules)

    def test_transport_failure_disallows_all(self, spark):
        from cloud_crawler_spark.sources.http_fetch import FailingTransport

        hosts = spark.createDataFrame([("down.example.com",)], "host string")
        got = fetch_robots(hosts, FailingTransport).collect()
        assert len(got) == 1 and "Disallow: /" in got[0]["body"]
        rules = build_rules(spark, fetch_robots(hosts, FailingTransport))
        r = rules.collect()
        assert len(r) == 1 and r[0]["allow"] is False and r[0]["prefix"] == "/"


class TestLiveRobotsCrawl:
    def _crawl(self, spark, site, **cfg):
        fetcher = HttpFetcher(transport_factory=functools.partial(DictTransport, site))
        corpus = make_corpus(spark, {})
        seeds = make_seeds(spark, [f"{_U}/0"])
        return crawl(spark, corpus, seeds,
                     CrawlConfig(fetcher=fetcher, live_robots=True, **cfg))

    def test_disallowed_path_not_crawled(self, spark):
        res = self._crawl(spark, _site("User-agent: *\nDisallow: /private"))
        got = {r["canon_url"] for r in
               res.crawled.where("code = 200").collect()}
        assert f"{_U}/keep" in got
        assert f"{_U}/private/x" not in got

    def test_no_robots_allows_everything(self, spark):
        res = self._crawl(spark, _site(None))
        got = {r["canon_url"] for r in
               res.crawled.where("code = 200").collect()}
        assert {f"{_U}/keep", f"{_U}/private/x"} <= got

    def test_live_robots_requires_live_fetcher(self, spark):
        corpus = make_corpus(spark, {"0": {}})
        seeds = make_seeds(spark, [f"{_U}/0"])
        with pytest.raises(ValueError):
            crawl(spark, corpus, seeds, CrawlConfig(live_robots=True))

    def test_rules_accumulate_not_refetched(self, spark):
        """Host fetched once: a 2-deep crawl hits the same host across
        rounds; fetch-once semantics mean the robots gate stays
        consistent (and the anti-join keeps covered hosts out of the
        refresh set — pinned here by the crawl completing with the
        same gating on every round)."""
        site = _site("User-agent: *\nDisallow: /private")
        site[f"{_U}/keep"] = {
            "code": 200,
            "body": b"<html><a href='/private/y'>c</a><a href='/k2'>d</a></html>",
            "content_type": "text/html",
        }
        site[f"{_U}/k2"] = {"code": 200, "body": b"<html>k2</html>",
                            "content_type": "text/html"}
        site[f"{_U}/private/y"] = {"code": 200, "body": b"<html>py</html>",
                                   "content_type": "text/html"}
        res = self._crawl(spark, site)
        got = {r["canon_url"] for r in res.crawled.where("code = 200").collect()}
        assert f"{_U}/k2" in got                 # round-2 child allowed
        assert f"{_U}/private/y" not in got      # round-2 child gated
        assert f"{_U}/private/x" not in got      # round-1 child gated


class TestCorpusRobotsAuthoritative:
    def test_corpus_covered_host_not_live_refetched_or_duplicated(self, spark):
        """A host whose robots.txt is already in corpus.robots must
        keep those rules authoritative under live_robots: the live
        body (which disagrees) is never fetched for it, and its
        Crawl-delay budget row is never duplicated — a second
        (host, budget) row would fan the override join out and
        double-fetch (and double-store) the host's URLs."""
        site = {
            f"{_U}/0": {
                "code": 200,
                "body": (b"<html><a href='/keep'>a</a>"
                         b"<a href='/corpusblocked/x'>b</a></html>"),
                "content_type": "text/html",
            },
            f"{_U}/keep": {"code": 200, "body": b"<html>k</html>",
                           "content_type": "text/html"},
            f"{_U}/corpusblocked/x": {"code": 200, "body": b"<html>c</html>",
                                      "content_type": "text/html"},
            # the LIVE robots disagrees with the corpus one; it must
            # never be consulted for this corpus-covered host
            f"{_U}/robots.txt": {
                "code": 200,
                "body": b"User-agent: *\nDisallow: /keep",
                "content_type": "text/plain",
            },
        }
        corpus = make_corpus(spark, {
            "robots": {"robots_body":
                       "User-agent: *\nCrawl-delay: 1\nDisallow: /corpusblocked"},
        })
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site))
        seeds = make_seeds(spark, [f"{_U}/0"])
        cfg = CrawlConfig(fetcher=fetcher, live_robots=True,
                          obey_robots_txt=True, honor_crawl_delay=True,
                          round_window_sec=60.0)
        res = crawl(spark, corpus, seeds, cfg)
        ok = [r["canon_url"] for r in res.crawled.where("code = 200").collect()]
        assert len(ok) == len(set(ok))                 # no duplicate rows
        assert f"{_U}/keep" in ok                      # live Disallow ignored
        assert f"{_U}/corpusblocked/x" not in ok       # corpus Disallow holds
