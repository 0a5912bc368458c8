"""REP robots-meta directives (beyond the 2013 reference, which
predates wide nofollow adoption): rel="nofollow" link gate,
<meta name="robots"> page gate, the X-Robots-Tag response-header twin
(CrawlConfig.honor_robots_meta), and the post-crawl codegen analysis
twin (functions/parse.robots_directives) used for REP noindex doc
filtering. Oracle-checked end-to-end in queries.q_robots_nofollow /
q_robots_meta; these pin the unit semantics.
"""

from __future__ import annotations

import functools

from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.functions.parse import (
    parse_page,
    robots_directive_match,
    robots_directives,
)
from cloud_crawler_spark.sources.http_fetch import DictTransport, HttpFetcher
from tests.helpers import crawled_names, make_corpus, make_seeds

_U = "http://www.example.com"


# ------------------------------------------------------------ parser


class TestParserCollection:
    def test_rel_nofollow_flags_aligned(self):
        html = (
            '<a href="/a" rel="NoFollow">a</a>'
            '<a href="/b" rel="ugc nofollow">b</a>'
            '<a href="/c" rel="noopener">c</a>'
            '<a href="/d">d</a>'
        )
        r = parse_page(html, collect_rel=True)
        assert r["links"] == ["/a", "/b", "/c", "/d"]
        assert r["rel_nofollow"] == [True, True, False, False]

    def test_rel_token_not_substring(self):
        r = parse_page('<a href="/a" rel="nofollowish">a</a>', collect_rel=True)
        assert r["rel_nofollow"] == [False]

    def test_dedupe_keeps_first_occurrence_rel(self):
        html = '<a href="/a" rel="nofollow">1</a><a href="/a">2</a>'
        r = parse_page(html, collect_rel=True)
        assert r["links"] == ["/a"]
        assert r["rel_nofollow"] == [True]

    def test_meta_robots_union_normalized(self):
        html = (
            '<head><meta name="ROBOTS" content="NOINDEX">'
            '<meta name="robots" content=" nofollow , noarchive ">'
            '<meta name="description" content="not robots"></head>'
        )
        r = parse_page(html, collect_meta=True)
        assert r["meta_robots"] == "noindex,nofollow,noarchive"

    def test_meta_robots_absent_is_none(self):
        r = parse_page("<html><body>x</body></html>", collect_meta=True)
        assert r["meta_robots"] is None

    def test_default_parse_unchanged(self):
        """Without the collect flags the output dict has no REP keys —
        the hot path (fastparse eligible) is untouched."""
        r = parse_page('<a href="/a" rel="nofollow">a</a>')
        assert r["links"] == ["/a"]
        assert "rel_nofollow" not in r and "meta_robots" not in r


# ------------------------------------------------- crawl-time gates


def _graph():
    return {
        "0": {
            "body": '<html><body><a href="/1">n</a>'
            '<a href="/2" rel="nofollow">nf</a></body></html>'
        },
        "1": {
            "body": '<html><head><meta name="robots" content="nofollow">'
            '</head><body><a href="/3">x</a></body></html>'
        },
        "2": {},
        "3": {},
    }


class TestHonorRobotsMeta:
    def test_rel_and_meta_gates(self, spark):
        corpus = make_corpus(spark, _graph())
        seeds = make_seeds(spark, [f"{_U}/0"])
        res = crawl(spark, corpus, seeds, CrawlConfig(honor_robots_meta=True))
        # /2 only reachable via the rel=nofollow link; /3 only via the
        # meta-nofollow page /1 — neither may be crawled
        assert crawled_names(res) == {"0", "1"}

    def test_gates_off_by_default(self, spark):
        corpus = make_corpus(spark, _graph())
        seeds = make_seeds(spark, [f"{_U}/0"])
        res = crawl(spark, corpus, seeds, CrawlConfig())
        assert crawled_names(res) == {"0", "1", "2", "3"}
        # and the column is present but NULL (config-independent schema)
        assert res.crawled.where(F.col("meta_robots").isNotNull()).count() == 0

    def test_meta_robots_column_stored(self, spark):
        corpus = make_corpus(spark, _graph())
        seeds = make_seeds(spark, [f"{_U}/0"])
        res = crawl(spark, corpus, seeds, CrawlConfig(honor_robots_meta=True))
        row = res.crawled.where(F.col("canon_url") == f"{_U}/1").first()
        assert row["meta_robots"] == "nofollow"

    def test_noindex_does_not_gate_crawl(self, spark):
        """REP: noindex pages may still be crawled and their links
        followed — noindex is a doc-export concern."""
        graph = dict(_graph())
        graph["1"] = {
            "body": '<html><head><meta name="robots" content="noindex">'
            '</head><body><a href="/3">x</a></body></html>'
        }
        corpus = make_corpus(spark, graph)
        seeds = make_seeds(spark, [f"{_U}/0"])
        res = crawl(spark, corpus, seeds, CrawlConfig(honor_robots_meta=True))
        assert crawled_names(res) == {"0", "1", "3"}

    def test_x_robots_tag_header_gate(self, spark):
        """Live-mode twin: a mixed-case X-Robots-Tag: nofollow header
        stops expansion of that page's links."""
        site = {
            f"{_U}/0": {
                "code": 200,
                "body": b'<html><a href="/1">x</a></html>',
                "content_type": "text/html",
                "headers": {
                    "content-type": ["text/html"],
                    "X-Robots-Tag": ["googlebot: nofollow"],
                },
            },
            f"{_U}/1": {
                "code": 200,
                "body": b"leaf",
                "content_type": "text/html",
            },
        }
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site)
        )
        corpus = make_corpus(spark, {})
        seeds = make_seeds(spark, [f"{_U}/0"])
        on = crawl(spark, corpus, seeds,
                   CrawlConfig(fetcher=fetcher, honor_robots_meta=True))
        assert crawled_names(on) == {"0"}
        off = crawl(spark, corpus, seeds, CrawlConfig(fetcher=fetcher))
        assert crawled_names(off) == {"0", "1"}


# ------------------------------------------- post-crawl analysis twin


class TestRobotsDirectivesExpr:
    def _df(self, spark, html, headers=None):
        return spark.createDataFrame(
            [(html.encode(), headers or {})],
            "html binary, headers map<string,array<string>>",
        )

    def _flags(self, spark, html, headers=None):
        d = robots_directives("html", headers_col="headers")
        row = (
            self._df(spark, html, headers)
            .select(
                robots_directive_match(d, "noindex").alias("ni"),
                robots_directive_match(d, "nofollow").alias("nf"),
            )
            .first()
        )
        return row["ni"], row["nf"]

    def test_name_first_and_content_first(self, spark):
        assert self._flags(
            spark, '<meta name="robots" content="noindex">'
        ) == (True, False)
        assert self._flags(
            spark, "<meta content='nofollow' name='robots'>"
        ) == (False, True)

    def test_none_implies_both(self, spark):
        assert self._flags(spark, '<meta name="robots" content="none">') == (
            True,
            True,
        )

    def test_header_twin_and_lookalikes(self, spark):
        assert self._flags(
            spark, "<html></html>", {"X-Robots-Tag": ["noindex, nofollow"]}
        ) == (True, True)
        # substrings must not match; non-robots meta must not match
        assert self._flags(
            spark,
            '<meta name="robots" content="nonofollowx">'
            '<meta name="viewport" content="noindex">',
        ) == (False, False)
