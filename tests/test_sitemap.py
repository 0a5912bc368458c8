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
