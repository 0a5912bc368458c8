"""RSS/Atom feed seed source: entry extraction, rel=next paging,
cycle proofing, and seeding a real crawl from the result."""

import warnings

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.sources.feeds import extract_feed_entries, feed_seeds
from tests.helpers import crawled_names, make_corpus

_U = "http://www.example.com"

_RSS_P1 = (
    '<?xml version="1.0"?>\n<rss version="2.0"><channel>\n'
    f"  <title>Blog</title>\n  <link>{_U}</link>\n"
    f'  <atom:link rel="next" href="{_U}/feed.xml?page=2"/>\n'
    f"  <item><title>Post 1</title><link>{_U}/0</link>"
    "<pubDate>Mon, 01 Apr 2013 00:00:00 GMT</pubDate></item>\n"
    f"  <item><link>\n    {_U}/1?x=1&amp;y=2\n  </link></item>\n"
    "  <item><title>no link — dropped</title></item>\n"
    "</channel></rss>"
)
_RSS_P2 = (
    "<rss><channel>"
    f"<link>{_U}</link>"
    # cycle: next points back at page 1
    f'<atom:link rel="next" href="{_U}/feed.xml"/>'
    f"<item><link>{_U}/2</link></item>"
    "</channel></rss>"
)
_ATOM = (
    '<?xml version="1.0"?>\n<feed xmlns="http://www.w3.org/2005/Atom">\n'
    "  <title>Atom blog</title>\n"
    f'  <link href="{_U}/atom"/>\n'
    f'  <entry><title>A</title><link href="{_U}/3"/>'
    "<updated>2013-04-02</updated></entry>\n"
    f'  <entry><link href="{_U}/0"/></entry>\n'  # dup with rss page 1
    "</feed>"
)


def _feed_corpus(spark):
    graph = {
        "feed.xml": {"body": _RSS_P1},
        "feed.xml?page=2": {"url": f"{_U}/feed.xml?page=2", "body": _RSS_P2},
        "atom.xml": {"body": _ATOM},
        "0": {"links": ["4"]},
        "1?x=1&y=2": {"url": f"{_U}/1?x=1&y=2", "body": "<html>one</html>"},
        "2": {},
        "3": {},
        "4": {},
    }
    return make_corpus(spark, graph)


class TestFeeds:
    def test_extract_rss(self, spark):
        corpus = _feed_corpus(spark)
        rows = extract_feed_entries(
            corpus.pages.where(F.col("url").endswith("feed.xml"))
        ).collect()
        by_link = {r.link: r for r in rows}
        # channel-level <link> is NOT an entry; link-less item dropped
        assert set(by_link) == {f"{_U}/0", f"{_U}/1?x=1&y=2"}
        assert by_link[f"{_U}/0"].kind == "rss"
        assert by_link[f"{_U}/0"].title == "Post 1"
        assert by_link[f"{_U}/0"].published.startswith("Mon, 01 Apr")
        assert by_link[f"{_U}/1?x=1&y=2"].title is None
        assert {r.next_url for r in rows} == {f"{_U}/feed.xml?page=2"}

    def test_extract_atom(self, spark):
        corpus = _feed_corpus(spark)
        rows = extract_feed_entries(
            corpus.pages.where(F.col("url").endswith("atom.xml"))
        ).collect()
        by_link = {r.link: r for r in rows}
        assert set(by_link) == {f"{_U}/3", f"{_U}/0"}
        assert by_link[f"{_U}/3"].kind == "atom"
        assert by_link[f"{_U}/3"].published == "2013-04-02"
        assert by_link[f"{_U}/3"].title == "A"
        assert {r.next_url for r in rows} == {None}

    def test_feed_seeds_paging_and_cycle(self, spark):
        corpus = _feed_corpus(spark)
        seeds = feed_seeds(
            spark, corpus,
            [f"{_U}/feed.xml", f"{_U}/atom.xml"],
        )
        got = sorted(r.url for r in seeds.collect())
        # union of both feeds and page 2, dups collapsed, cycle ended
        assert got == [f"{_U}/0", f"{_U}/1?x=1&y=2", f"{_U}/2", f"{_U}/3"]

    def test_feed_seeds_depth_warning(self, spark):
        corpus = _feed_corpus(spark)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            seeds = feed_seeds(spark, corpus, [f"{_U}/feed.xml"], max_pages=1)
            got = sorted(r.url for r in seeds.collect())
        assert got == [f"{_U}/0", f"{_U}/1?x=1&y=2"]  # page 2 not reached
        assert any("not exhausted" in str(x.message) for x in w)

    def test_feed_seeds_drive_crawl(self, spark):
        from cloud_crawler_spark import CrawlConfig, crawl

        corpus = _feed_corpus(spark)
        seeds = feed_seeds(spark, corpus, [f"{_U}/feed.xml"])
        res = crawl(spark, corpus, seeds, CrawlConfig())
        # seeds 0,1,2 crawl; 0 links out to 4
        assert crawled_names(res) == {"0", "1?x=1&y=2", "2", "4"}

    def test_unknown_root_contributes_nothing(self, spark):
        corpus = _feed_corpus(spark)
        seeds = feed_seeds(spark, corpus, ["http://nowhere.example/feed"])
        assert seeds.count() == 0


class TestFeedEdgeCases:
    def test_next_href_before_rel(self, spark):
        from cloud_crawler_spark.sources.feeds import extract_feed_entries

        body = (
            "<rss><channel>"
            f'<atom:link href="{_U}/feed.xml?page=2" rel="next"/>'
            f"<item><link>{_U}/0</link></item>"
            "</channel></rss>"
        )
        pages = spark.createDataFrame([(f"{_U}/feed.xml", body)],
                                      "url string, html string")
        [row] = extract_feed_entries(pages).collect()
        assert row.next_url == f"{_U}/feed.xml?page=2"

    def test_atom_prefers_alternate_over_self(self, spark):
        from cloud_crawler_spark.sources.feeds import extract_feed_entries

        body = (
            "<feed>"
            f'<entry><link rel="self" href="{_U}/api/1.atom"/>'
            f'<link rel="alternate" href="{_U}/post/1"/></entry>'
            f'<entry><link rel="self" href="{_U}/api/2.atom"/>'
            f'<link href="{_U}/post/2"/></entry>'     # rel-less = alternate
            f'<entry><link rel="self" href="{_U}/api/3.atom"/></entry>'
            "</feed>"
        )
        pages = spark.createDataFrame([(f"{_U}/atom.xml", body)],
                                      "url string, html string")
        links = sorted(r.link for r in extract_feed_entries(pages).collect())
        # alternate beats self; rel-less beats self; self-only kept
        assert links == [f"{_U}/api/3.atom", f"{_U}/post/1", f"{_U}/post/2"]


def test_lsh_banded_drops_empty_docs(spark):
    from cloud_crawler_spark.operators.dedup import (
        lsh_banded, lsh_candidate_pairs,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real tokens here"),
         (4, "real tokens here")],
        "doc_id long, text string")
    banded = lsh_banded(df, k=8, bands=2)
    # empty/whitespace docs have no signature -> no band rows
    assert {r.doc_id for r in banded.collect()} == {3, 4}
    pairs = {(r.doc_a, r.doc_b)
             for r in lsh_candidate_pairs(df, k=8, bands=2).collect()}
    assert pairs == {(3, 4)}  # no spurious empty-bucket pair (1,2)


class TestFeedDiscovery:
    def test_discovers_and_absolutizes(self, spark):
        from cloud_crawler_spark.sources.feeds import discover_feeds

        body = (
            '<html><head>'
            '<link rel="stylesheet" href="/style.css"/>'
            f'<link rel="alternate" type="application/rss+xml" '
            f'href="/feed.xml" title="RSS"/>'
            f'<link rel="alternate" href="{_U}/atom.xml" '
            f'type="application/atom+xml"/>'
            '</head><body/></html>'
        )
        pages = spark.createDataFrame([(f"{_U}/blog/post", body)],
                                      "url string, html string")
        got = {(r.feed_url, r.feed_type)
               for r in discover_feeds(pages).collect()}
        assert got == {(f"{_U}/feed.xml", "rss"),
                       (f"{_U}/atom.xml", "atom")}

    def test_composes_with_feed_seeds(self, spark):
        """The crawl composition: discover feeds on crawled pages,
        then seed from them."""
        from cloud_crawler_spark.sources.feeds import (
            discover_feeds, feed_seeds,
        )

        corpus = _feed_corpus(spark)
        landing = spark.createDataFrame(
            [(f"{_U}/home",
              '<html><head><link rel="alternate" '
              'type="application/rss+xml" href="/feed.xml"/></head></html>')],
            "url string, html string")
        found = discover_feeds(landing)
        seeds = feed_seeds(spark, corpus,
                           found.select(F.col("feed_url").alias("url")))
        got = sorted(r.url for r in seeds.collect())
        assert got == [f"{_U}/0", f"{_U}/1?x=1&y=2", f"{_U}/2"]
