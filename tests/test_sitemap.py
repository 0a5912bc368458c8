"""Sitemap seed source: <loc> extraction, sitemapindex recursion,
entity unescaping, and seeding a real crawl from the result."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.sources.sitemap import extract_locs, sitemap_seeds
from tests.helpers import crawled_names, make_corpus

_U = "http://www.example.com"


def _sitemap_corpus(spark):
    index = (
        '<?xml version="1.0"?>\n<sitemapindex>\n'
        f"  <sitemap><loc>{_U}/maps/a.xml</loc></sitemap>\n"
        f"  <sitemap><loc>\n    {_U}/maps/b.xml\n  </loc></sitemap>\n"
        "</sitemapindex>"
    )
    map_a = (
        '<?xml version="1.0"?>\n<urlset>\n'
        f"  <url><loc>{_U}/0</loc><lastmod>2013-04-01</lastmod></url>\n"
        f"  <url><loc>{_U}/1?x=1&amp;y=2</loc></url>\n"
        "</urlset>"
    )
    map_b = (
        "<urlset>"
        f"<url><loc>{_U}/2</loc></url>"
        f"<url><loc>{_U}/0</loc></url>"  # duplicate across maps
        "</urlset>"
    )
    graph = {
        "sitemap.xml": {"body": index},
        "maps/a.xml": {"body": map_a},
        "maps/b.xml": {"body": map_b},
        "0": {"links": ["3"]},
        "1?x=1&y=2": {"url": f"{_U}/1?x=1&y=2", "body": "<html>one</html>"},
        "2": {},
        "3": {},
    }
    return make_corpus(spark, graph)


class TestSitemap:
    def test_extract_locs(self, spark):
        corpus = _sitemap_corpus(spark)
        locs = extract_locs(
            corpus.pages.where(F.col("url").endswith("sitemap.xml"))
        ).collect()
        assert {r["loc"] for r in locs} == {f"{_U}/maps/a.xml", f"{_U}/maps/b.xml"}
        assert all(r["is_index"] for r in locs)

    def test_seeds_recursion_and_unescape(self, spark):
        corpus = _sitemap_corpus(spark)
        seeds = sitemap_seeds(spark, corpus, [f"{_U}/sitemap.xml"])
        urls = {r["url"] for r in seeds.collect()}
        # &amp; unescaped, duplicate /0 collapsed, both child maps reached
        assert urls == {f"{_U}/0", f"{_U}/1?x=1&y=2", f"{_U}/2"}

    def test_depth_exhaustion_warns(self, spark):
        corpus = _sitemap_corpus(spark)
        with pytest.warns(UserWarning, match="not exhausted"):
            seeds = sitemap_seeds(spark, corpus, [f"{_U}/sitemap.xml"], max_depth=1)
        # level 1 only saw the index — no page seeds yet
        assert seeds.count() == 0

    def test_crawl_from_sitemap_seeds(self, spark):
        from cloud_crawler_spark import CrawlConfig, crawl

        corpus = _sitemap_corpus(spark)
        seeds = sitemap_seeds(spark, corpus, [f"{_U}/sitemap.xml"])
        res = crawl(spark, corpus, seeds, CrawlConfig())
        # /3 discovered by the crawl itself via /0's link
        assert crawled_names(res) >= {"0", "2", "3"}

    def test_unknown_root_is_empty(self, spark):
        corpus = _sitemap_corpus(spark)
        seeds = sitemap_seeds(spark, corpus, [f"{_U}/nope.xml"])
        assert seeds.count() == 0


class TestRobotsSitemapDiscovery:
    def test_sitemap_urls_extraction(self, spark):
        from cloud_crawler_spark.operators.robots import sitemap_urls

        robots = spark.createDataFrame(
            [
                # global directive before any group
                ("a.com", f"Sitemap: {_U}/sitemap.xml\nUser-agent: *\nDisallow: /p"),
                # inside a group (still global per spec), odd case+indent
                ("b.com", "User-agent: *\n  sItEmAp:\thttp://b.com/sm.xml\nAllow: /"),
                # two sitemaps, one duplicated
                ("c.com", "Sitemap: http://c.com/1.xml\nSitemap: http://c.com/2.xml\n"
                          "Sitemap: http://c.com/1.xml"),
                # none
                ("d.com", "User-agent: *\nDisallow:"),
                # not at line start (e.g. inside a comment) -> ignored
                ("e.com", "# see Sitemap: http://e.com/x.xml elsewhere"),
            ],
            "host string, body string",
        )
        got = {(r["host"], r["sitemap_url"]) for r in sitemap_urls(robots).collect()}
        assert got == {
            ("a.com", f"{_U}/sitemap.xml"),
            ("b.com", "http://b.com/sm.xml"),
            ("c.com", "http://c.com/1.xml"),
            ("c.com", "http://c.com/2.xml"),
        }

    def test_robots_bootstrapped_seed_crawl(self, spark):
        """End to end: discover the sitemap from robots.txt, expand it,
        crawl from the resulting seeds."""
        from cloud_crawler_spark import CrawlConfig, crawl
        from cloud_crawler_spark.operators.robots import sitemap_urls

        corpus = _sitemap_corpus(spark)
        robots = spark.createDataFrame(
            [("www.example.com", f"Sitemap: {_U}/sitemap.xml\nUser-agent: *\nDisallow:")],
            "host string, body string",
        )
        roots = sitemap_urls(robots).select(F.col("sitemap_url").alias("url"))
        seeds = sitemap_seeds(spark, corpus, roots)
        res = crawl(spark, corpus, seeds, CrawlConfig(depth_limit=1))
        # seeded pages 0,1,2 plus 0's link -> 3
        assert crawled_names(res) == {"0", "1?x=1&y=2", "2", "3"}

    def test_max_depth_zero_returns_empty_seeds(self, spark):
        corpus = _sitemap_corpus(spark)
        seeds = sitemap_seeds(spark, corpus, [f"{_U}/sitemap.xml"], max_depth=0)
        assert seeds.count() == 0
        assert seeds.columns == ["url", "priority"]


class TestSitemapCoverage:
    def test_coverage_composes_with_extract_locs(self, spark):
        from cloud_crawler_spark.sources.sitemap import (
            extract_locs, sitemap_coverage,
        )

        corpus = _sitemap_corpus(spark)
        declared = extract_locs(
            corpus.pages.where(F.col("url").contains("maps/"))
        ).where(~F.col("is_index")).select(F.col("loc").alias("url"))
        # pretend the crawl fetched 0 and 3 (3 is undeclared)
        crawled = spark.createDataFrame(
            [(f"{_U}/0",), (f"{_U}/3",)], "url string")
        [row] = sitemap_coverage(declared, crawled).collect()
        assert row.host == "www.example.com"
        # declared: /0, /1?x=1&y=2, /2 (deduped across maps)
        assert (row.n_declared, row.n_crawled, row.n_both) == (3, 2, 1)
        assert (row.n_missing, row.n_extra) == (2, 1)
        assert row.coverage_ppm == 1000000 * 1 // 3

    def test_zero_declared_host(self, spark):
        from cloud_crawler_spark.sources.sitemap import sitemap_coverage

        declared = spark.createDataFrame([], "url string")
        crawled = spark.createDataFrame([("http://only.crawled/x",)],
                                        "url string")
        [row] = sitemap_coverage(declared, crawled).collect()
        assert (row.n_declared, row.n_crawled, row.coverage_ppm) == (0, 1, 0)
