"""RFC 9309 wildcard robots rules (* and trailing $) — beyond the 2013
reference's Robotex (prefix-only). operators/robots.pattern_regex +
the filter_allowed regex arm; plain prefixes keep the startswith fast
path. Reference parity anchor for the prefix behavior:
spec/crawl_job_spec.rb:194-207."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.operators.robots import (
    build_rules,
    filter_allowed,
    pattern_regex,
)
from tests.helpers import crawled_names, make_corpus, make_seeds

_U = "http://www.example.com"


class TestPatternRegex:
    def test_plain_prefix_is_empty(self):
        assert pattern_regex("/p") == ""
        assert pattern_regex("/a/b.html") == ""

    def test_star(self):
        assert pattern_regex("/*.php") == r"^/.*\.php"

    def test_trailing_anchor(self):
        assert pattern_regex("/p$") == "^/p$"

    def test_star_and_anchor(self):
        assert pattern_regex("/*.php$") == r"^/.*\.php$"

    def test_metachars_escaped(self):
        assert pattern_regex("/a+b?*") == r"^/a\+b\?.*"


def _gate(spark, body, paths):
    rules = build_rules(
        spark,
        spark.createDataFrame([("h.com", body)], "host string, body string"),
    )
    cands = spark.createDataFrame(
        [("h.com", p) for p in paths], "host string, path string"
    )
    return [r["path"] for r in filter_allowed(cands, rules).collect()]


class TestWildcardGate:
    def test_star_disallow(self, spark):
        out = _gate(
            spark,
            "User-agent: *\nDisallow: /*.php",
            ["/a.php", "/x/y.php", "/a.html", "/php"],
        )
        assert sorted(out) == ["/a.html", "/php"]

    def test_dollar_anchor(self, spark):
        out = _gate(
            spark,
            "User-agent: *\nDisallow: /p$",
            ["/p", "/p/sub", "/pq"],
        )
        assert sorted(out) == ["/p/sub", "/pq"]

    def test_allow_wildcard_overrides_shorter_disallow(self, spark):
        # RFC 9309 longest-match: Allow /dir/*.html (13) beats
        # Disallow /dir/ (5)
        out = _gate(
            spark,
            "User-agent: *\nDisallow: /dir/\nAllow: /dir/*.html",
            ["/dir/a.html", "/dir/a.pdf", "/other"],
        )
        assert sorted(out) == ["/dir/a.html", "/other"]

    def test_plain_rules_unaffected(self, spark):
        out = _gate(
            spark,
            "User-agent: *\nDisallow: /x",
            ["/x/1", "/ok"],
        )
        assert out == ["/ok"]


class TestWildcardCrawl:
    def test_crawl_honors_wildcard_disallow(self, spark):
        """End-to-end: Disallow: /*3 keeps page 3 out of the store."""
        graph = {
            "0": {"links": ["1", "2", "3"]},
            "1": {}, "2": {}, "3": {},
            "_robots": {"robots_body": "User-agent: *\nDisallow: /*3"},
        }
        corpus = make_corpus(spark, graph)
        res = crawl(spark, corpus, make_seeds(spark, [f"{_U}/0"]), CrawlConfig())
        assert crawled_names(res) == {"0", "1", "2"}
