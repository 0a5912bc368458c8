"""Re-expression of the reference's bfs/crawl-job RSpec suite
(SURVEY.md §5 table) against the corpus-backed Spark crawler.
Each test = one FIXTURES.md scenario graph = one crawl."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl, curl
from cloud_crawler_spark.plans.crawler import Crawler

from tests.helpers import crawl_order, crawled_names, make_corpus, make_seeds

SEED = ["http://www.example.com/0"]


def test_bfs_basic(spark):
    """spec/crawl_job_spec.rb:64-76: crawl 0->{1,2}, 1->{3} => 4 pages
    stored, all in the seen set, BFS order."""
    graph = {"0": {"links": ["1", "2"]}, "1": {"links": ["3"]}, "2": {}, "3": {}}
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED))
    assert crawled_names(res) == {"0", "1", "2", "3"}
    assert crawl_order(res) == [
        "http://www.example.com/0",
        "http://www.example.com/1",
        "http://www.example.com/2",
        "http://www.example.com/3",
    ]
    seen = {r[0] for r in res.seen.collect()}
    assert seen == {f"http://www.example.com/{i}" for i in range(4)}


def test_bfs_preseen(spark):
    """spec/crawl_job_spec.rb:79-95: pre-visiting page 3 => only 3 crawled."""
    graph = {"0": {"links": ["1", "2"]}, "1": {"links": ["3"]}, "2": {}, "3": {}}
    pre = spark.createDataFrame([("http://www.example.com/3",)], "canon_url string")
    res = crawl(
        spark, make_corpus(spark, graph), make_seeds(spark, SEED), initial_seen=pre
    )
    assert crawled_names(res) == {"0", "1", "2"}


def test_offdomain_links_not_followed(spark):
    """spec/crawl_job_spec.rb:97-104: off-domain href not followed."""
    graph = {
        "0": {"links": ["1"], "hrefs": ["http://www.other.com/"]},
        "1": {},
        "other": {"url": "http://www.other.com/", "host": "www.other.com"},
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED))
    hosts = {r[0] for r in res.crawled.select("host").collect()}
    assert hosts == {"www.example.com"}
    assert crawled_names(res) == {"0", "1"}


def test_offdomain_redirect_not_followed(spark):
    """spec/crawl_job_spec.rb:106-113: off-domain redirect not followed."""
    graph = {
        "0": {"links": ["1"]},
        "1": {"redirect_to": "http://www.other.com/"},
        "other": {"url": "http://www.other.com/", "host": "www.other.com"},
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED))
    hosts = {r[0] for r in res.crawled.select("host").collect()}
    assert "www.other.com" not in hosts
    assert crawled_names(res) == {"0"}  # page 1 is a 301, stored but not 200


def test_redirect_chain_keep_all_hops(spark):
    """spec/crawl_job_spec.rb:115-123: 0->1(301)->2 => 3 pages stored."""
    graph = {"0": {"links": ["1"]}, "1": {"redirect_to": "http://www.example.com/2"}, "2": {}}
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig(keep_redirects=True))
    stored = sorted((r["canon_url"], r["code"]) for r in res.crawled.collect())
    assert stored == [
        ("http://www.example.com/0", 200),
        ("http://www.example.com/1", 301),
        ("http://www.example.com/2", 200),
    ]


def test_redirect_chain_keep_last_only(spark):
    """spec/batch_crawl_job_spec.rb:98-117: keep_redirects=false => 2 pages."""
    graph = {"0": {"links": ["1"]}, "1": {"redirect_to": "http://www.example.com/2"}, "2": {}}
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig(keep_redirects=False))
    stored = sorted(r["canon_url"] for r in res.crawled.collect())
    assert stored == ["http://www.example.com/0", "http://www.example.com/2"]


def test_query_string_identity(spark):
    """spec/crawl_job_spec.rb:133-142: '1?foo=1' and '1' are distinct."""
    graph = {
        "0": {"hrefs": ["http://www.example.com/1?foo=1"]},
        "1?foo=1": {"url": "http://www.example.com/1?foo=1"},
        "1": {},
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED))
    assert crawled_names(res) == {"0", "1?foo=1"}


def test_skip_query_strings(spark):
    """dsl_core.rb:269-271: skip_query_strings drops '?' links."""
    graph = {
        "0": {"hrefs": ["http://www.example.com/1?foo=1"], "links": ["2"]},
        "1?foo=1": {"url": "http://www.example.com/1?foo=1"},
        "2": {},
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig(skip_query_strings=True))
    assert crawled_names(res) == {"0", "2"}


def test_skip_links_like(spark):
    """spec/crawl_job_spec.rb:181-192: patterns [/1/,/3/] => 2 pages."""
    graph = {"0": {"links": ["1", "2"]}, "1": {"links": ["3"]}, "2": {}, "3": {}}
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig(skip_link_patterns=["1", "3"]))
    assert crawled_names(res) == {"0", "2"}


def test_focus_crawl(spark):
    """spec/crawl_job_spec.rb:168-179: link filter rejecting /1/ => 0 and 2."""
    graph = {"0": {"links": ["1", "2"]}, "1": {"links": ["3"]}, "2": {}, "3": {}}
    cfg = CrawlConfig(focus_filter=lambda links: links.where(~F.col("path").rlike("1")))
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED), cfg)
    assert crawled_names(res) == {"0", "2"}


def test_robots_disallow(spark):
    """spec/crawl_job_spec.rb:194-207: Disallow: /1 => page 1 not stored."""
    graph = {
        "0": {"links": ["1", "2"]}, "1": {}, "2": {},
        "_robots": {"robots_body": "User-agent: *\nDisallow: /1"},
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED))
    assert crawled_names(res) == {"0", "2"}


def test_robots_ignored_when_disabled(spark):
    graph = {
        "0": {"links": ["1", "2"]}, "1": {}, "2": {},
        "_robots": {"robots_body": "User-agent: *\nDisallow: /1"},
    }
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig(obey_robots_txt=False))
    assert crawled_names(res) == {"0", "1", "2"}


def test_depth_limit(spark):
    """spec/crawl_job_spec.rb:245-248: limit 3 on a 5-chain => 4 pages."""
    graph = {str(i): {"links": [str(i + 1)]} for i in range(4)} | {"4": {}}
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig(depth_limit=3))
    assert crawled_names(res) == {"0", "1", "2", "3"}
    depths = dict(res.crawled.select("canon_url", "depth").collect())
    assert depths["http://www.example.com/3"] == 3


def test_curl_list_mode(spark):
    """spec/batch_curl_job_spec.rb:83-91: fetch list, no expansion."""
    graph = {str(i): {"links": [str((i + 1) % 4)]} for i in range(4)}
    urls = make_seeds(spark, [f"http://www.example.com/{i}" for i in range(4)])
    res = curl(spark, make_corpus(spark, graph), urls)
    assert crawled_names(res) == {"0", "1", "2", "3"}
    assert res.rounds == 1  # exactly one pass, no frontier growth


def test_discard_page(spark):
    """spec/crawl_job_spec.rb:149-153: discard_page nulls the body."""
    graph = {"0": {"links": ["1"]}, "1": {}}
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED),
                CrawlConfig(discard_page=True))
    assert res.crawled.where(F.col("html").isNotNull()).count() == 0
    # text survives (extracted before the discard, page.rb:109-113)
    assert res.crawled.where(F.length("text") > 0).count() == 2


def test_page_counter_hook(spark):
    """on_every_page counter (spec/crawl_job_spec.rb:155-166): derived
    aggregation over the crawled table == page count."""
    graph = {"0": {"links": ["1", "2"]}, "1": {}, "2": {}}
    res = crawl(spark, make_corpus(spark, graph), make_seeds(spark, SEED))
    assert res.crawled.where("fetched AND code = 200").count() == 3


def test_extracted_text_byte_identical(spark):
    """The per-URL invariant: crawled.text == corpus golden text bytes."""
    graph = {"0": {"links": ["1"]}, "1": {"body": "<p>café &amp; more  </p>"}}
    corpus = make_corpus(spark, graph)
    res = crawl(spark, corpus, make_seeds(spark, SEED))
    got = dict(res.crawled.select("canon_url", "text").collect())
    want = dict(corpus.pages.select("canon_url", "text").collect())
    for url, text in want.items():
        assert got[url].encode() == text.encode(), url


def test_deterministic_order_across_parallelism(spark):
    """Crawl order must derive from data, never partition/task order:
    same graph, different shuffle partitioning => identical order."""
    graph = {"0": {"links": ["3", "1", "2"]}, "1": {"links": ["4"]}, "2": {}, "3": {}, "4": {}}
    corpus = make_corpus(spark, graph)
    orders = []
    for parts in ("1", "7"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        res = crawl(spark, corpus, make_seeds(spark, SEED))
        orders.append(crawl_order(res))
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert orders[0] == orders[1]
    # document order within the parent page: 3 before 1 before 2
    assert orders[0][1:4] == [
        "http://www.example.com/3",
        "http://www.example.com/1",
        "http://www.example.com/2",
    ]
