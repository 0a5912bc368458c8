"""Round-2 feature specs: live-HTTP fetch stage (S4/S5/S6), crawled
to_hash schema parity (page.rb:255-288), content-type gates (F8,
page.rb:185-195), selector link extraction (P3), Iceberg/doc-store
backends, and the streaming Bloom intra-batch dedup fix."""

from __future__ import annotations

import functools

import numpy as np
import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.config import CrawlConfig
from cloud_crawler_spark.functions.parse import parse_page, parse_selector
from cloud_crawler_spark.page import TO_HASH_FIELDS, page_from_hash, page_to_hash, to_hash_df
from cloud_crawler_spark.plans.crawler import crawl
from cloud_crawler_spark.sources.corpus import PAGES_SCHEMA, prepare_corpus
from cloud_crawler_spark.sources.http_fetch import (
    DictTransport,
    FailingTransport,
    FetchResponse,
    HttpFetcher,
)
from cloud_crawler_spark.sources.store import FrontierStore, IcebergFrontierStore, make_store
from cloud_crawler_spark.sources.webgen import fake_page_html

from tests.helpers import crawl_order, crawled_names, make_corpus, make_seeds

HOST = "www.example.com"


def _u(name: str) -> str:
    return f"http://{HOST}/{name}"


def _site_from_graph(graph: dict) -> dict:
    """FakePage graph -> {url: response spec} for FakeTransport."""
    site = {}
    for name, spec in graph.items():
        if "redirect_to" in spec:
            site[_u(name)] = {
                "code": 301,
                "redirect_to": spec["redirect_to"],
                "content_type": "text/html",
                "response_time": 1,
            }
        else:
            html = fake_page_html(name, links=spec.get("links"),
                                  hrefs=spec.get("hrefs"), base=spec.get("base"),
                                  host=spec.get("host", HOST))
            site[_u(name)] = {
                "code": 200,
                "body": html.encode(),
                "content_type": "text/html",
                "response_time": 1,
            }
    return site


GRAPH = {"0": {"links": ["1", "2"]}, "1": {"links": ["3"]}, "2": {}, "3": {}}


class TestHttpFetcher:
    def test_live_crawl_matches_corpus_crawl(self, spark):
        """The injected mapInPandas fetch stage reproduces the corpus
        join's crawl: same pages, same deterministic order."""
        corpus = make_corpus(spark, GRAPH)
        seeds = make_seeds(spark, [_u("0")])
        base = crawl(spark, corpus, seeds, CrawlConfig())

        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, _site_from_graph(GRAPH))
        )
        live = crawl(spark, corpus, seeds, CrawlConfig(fetcher=fetcher))
        assert crawled_names(live) == crawled_names(base) == {"0", "1", "2", "3"}
        assert crawl_order(live) == crawl_order(base)

    def test_fetch_error_page_semantics(self, spark):
        """Transport exception -> stored row with error set, code NULL,
        fetched=false (http.rb:89, spec/http_spec.rb:33-55)."""
        corpus = make_corpus(spark, GRAPH)
        fetcher = HttpFetcher(transport_factory=FailingTransport, retries=3)
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]),
                    CrawlConfig(fetcher=fetcher))
        rows = res.crawled.collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["fetched"] is False and r["code"] is None
        assert "TimeoutError" in r["error"]
        assert res.rounds == 1  # nothing expanded

    def test_retries_recover_transient_failures(self, spark):
        """First two attempts fail, third succeeds (http.rb:211-216:
        3 tries). One URL -> transport sees 3 calls, page stored."""
        corpus = make_corpus(spark, {"0": {}})
        site = _site_from_graph({"0": {}})
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site, 2), retries=3
        )
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]),
                    CrawlConfig(fetcher=fetcher))
        r = res.crawled.collect()[0]
        assert r["fetched"] is True and r["code"] == 200 and r["error"] is None

    def test_retries_exhausted_is_error_row(self, spark):
        # http.rb:211-216: retries=3 means 1 initial + 3 retries = 4
        # attempts; 4 failures exhaust it (3 would recover — see
        # tests/test_round3_features.py::TestRetryParity)
        corpus = make_corpus(spark, {"0": {}})
        site = _site_from_graph({"0": {}})
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site, 4), retries=3
        )
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]),
                    CrawlConfig(fetcher=fetcher))
        r = res.crawled.collect()[0]
        assert r["fetched"] is False and "ConnectionError" in r["error"]

    def test_max_content_bytes_truncates_and_records(self, spark):
        """Per-response body budget (the 100 TB memory guard): an
        over-cap body is stored cut at the cap with the ISO 28500
        WARC-Truncated: length record in the stored headers map; pages
        under the cap are untouched."""
        big = b"<html><body>" + b"x" * 5000 + b"</body></html>"
        site = {
            _u("0"): {"code": 200, "body": big, "content_type": "text/html",
                      "response_time": 1},
            _u("small"): {"code": 200, "body": b"<html>ok</html>",
                          "content_type": "text/html", "response_time": 1},
        }
        corpus = make_corpus(spark, {"0": {}, "small": {}})
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site),
            max_content_bytes=1000,
        )
        res = crawl(spark, corpus, make_seeds(spark, [_u("0"), _u("small")]),
                    CrawlConfig(fetcher=fetcher))
        rows = {r["url"]: r for r in res.crawled.collect()}
        r0 = rows[_u("0")]
        assert r0["fetched"] is True and len(r0["html"]) == 1000
        assert bytes(r0["html"]) == big[:1000]
        assert r0["headers"]["warc-truncated"] == ["length"]
        rs = rows[_u("small")]
        assert bytes(rs["html"]) == b"<html>ok</html>"
        assert "warc-truncated" not in (rs["headers"] or {})

    def test_circuit_breaker_short_circuits_dead_host(self, spark):
        """After `circuit_break_after` consecutive transport failures
        on a host, its remaining rows in the partition become
        CircuitOpen error rows WITHOUT touching the network — a dead
        host's 10k frontier URLs cost N timeouts, not 10k timeouts."""
        names = [str(i) for i in range(6)]
        corpus = make_corpus(spark, {n: {} for n in names})
        fetcher = HttpFetcher(
            transport_factory=FailingTransport, retries=0,
            n_partitions=1, circuit_break_after=2,
        )
        res = crawl(spark, corpus, make_seeds(spark, [_u(n) for n in names]),
                    CrawlConfig(fetcher=fetcher))
        errs = [r["error"] for r in res.crawled.collect()]
        assert len(errs) == 6 and all(e for e in errs)
        assert sum("TimeoutError" in e for e in errs) == 2
        assert sum(e.startswith("CircuitOpen") for e in errs) == 4

    def test_circuit_breaker_resets_on_success(self, spark):
        """A fetched page (even one isolated failure earlier) resets
        the consecutive-failure count: the circuit never opens when
        failures don't streak."""
        names = [str(i) for i in range(6)]
        site = _site_from_graph({n: {} for n in names})
        corpus = make_corpus(spark, {n: {} for n in names})
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site, 1),
            retries=0, n_partitions=1, circuit_break_after=2,
        )
        res = crawl(spark, corpus, make_seeds(spark, [_u(n) for n in names]),
                    CrawlConfig(fetcher=fetcher))
        rows = res.crawled.collect()
        errs = [r["error"] for r in rows if r["error"]]
        assert len(errs) == 1 and "ConnectionError" in errs[0]
        assert sum(r["fetched"] for r in rows) == 5
        assert not any((r["error"] or "").startswith("CircuitOpen")
                       for r in rows)

    def test_redirect_chain_followed_same_host_only(self, spark):
        """0 -> r(301 to 1) -> 1; off-domain redirect not followed
        (http.rb:245-247; spec/crawl_job_spec.rb:106-123)."""
        graph = {
            "0": {"links": ["r", "x"]},
            "r": {"redirect_to": _u("1")},
            "1": {},
            "x": {"redirect_to": "http://other.example.org/evil"},
        }
        corpus = make_corpus(spark, graph)
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, _site_from_graph(graph))
        )
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]),
                    CrawlConfig(fetcher=fetcher))
        rows = {r["canon_url"]: r for r in res.crawled.collect()}
        # hop pages kept (keep_redirects default True): 301 row + landing
        assert rows[_u("r")]["code"] == 301 and rows[_u("r")]["redirect_to"] == _u("1")
        assert rows[_u("1")]["code"] == 200 and rows[_u("1")]["hop"] == 1
        # off-domain: the 301 row stored, target never fetched
        assert rows[_u("x")]["code"] == 301
        assert not any("other.example.org" in u for u in rows)

    def test_response_time_populated(self, spark):
        corpus = make_corpus(spark, {"0": {}})
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, _site_from_graph({"0": {}}))
        )
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]),
                    CrawlConfig(fetcher=fetcher))
        assert res.crawled.collect()[0]["response_time"] == 1


class TestToHashParity:
    def test_to_hash_field_list_and_round_trip(self, spark):
        """to_hash carries exactly the reference's 12 keys
        (page.rb:255-268) and from_hash round-trips with its coercions
        (page.rb:271-288)."""
        corpus = make_corpus(spark, GRAPH)
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]), CrawlConfig())
        hashed = to_hash_df(res.crawled)
        assert hashed.columns == TO_HASH_FIELDS

        for row in res.crawled.collect():
            h = page_to_hash(row)
            assert list(h.keys()) == TO_HASH_FIELDS
            p = page_from_hash(h)
            assert p["url"] == row["url"]
            assert p["code"] == row["code"]
            assert p["depth"] == row["depth"]
            assert p["fetched"] == row["fetched"]
            assert p["visited"] is True
            assert p["response_time"] == 0          # corpus mode
            assert p["redirect_to"] is None or p["redirect_to"] == row["redirect_to"]
            assert p["links"] == list(row["links"])

    def test_corpus_rows_have_parity_columns(self, spark):
        corpus = make_corpus(spark, GRAPH)
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]), CrawlConfig())
        cols = set(res.crawled.columns)
        assert {"response_time", "error", "visited", "content_type"} <= cols
        r = res.crawled.where("code = 200").collect()[0]
        assert r["error"] is None and r["visited"] is True
        assert r["content_type"] == "text/html"


class TestContentTypeGate:
    def test_non_html_row_stored_but_not_expanded(self, spark):
        """F8 (page.rb:185-195): a PDF row is fetched and stored, but
        its body is never parsed — no links, no text, no children."""
        html_with_links = fake_page_html("0", links=["pdf"], host=HOST)
        pdf_body = b"<a href='http://www.example.com/secret'>not really html</a>"
        import datetime as dt

        ts = dt.datetime(2013, 4, 1)
        pages = spark.createDataFrame(
            [
                (_u("0"), ts, html_with_links.encode(), "", "en", "text/html"),
                (_u("pdf"), ts, pdf_body, "", "en", "application/pdf"),
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string, "
            "content_type string",
        )
        corpus = prepare_corpus(pages)
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]), CrawlConfig())
        rows = {r["canon_url"]: r for r in res.crawled.collect()}
        assert rows[_u("pdf")]["code"] == 200 and rows[_u("pdf")]["fetched"]
        assert rows[_u("pdf")]["links"] == [] and rows[_u("pdf")]["text"] == ""
        assert _u("secret") not in rows  # the gated body was never expanded

    def test_missing_content_type_defaults_html(self, spark):
        corpus = make_corpus(spark, {"0": {"links": ["1"]}, "1": {}})
        res = crawl(spark, corpus, make_seeds(spark, [_u("0")]), CrawlConfig())
        assert crawled_names(res) == {"0", "1"}


class TestSelectors:
    HTML = (
        "<html><body>"
        "<h4><a href='http://x.com/in-h4'>t</a></h4>"
        "<div><span><a href='http://x.com/in-div-span'>t</a></span></div>"
        "<p><a href='http://x.com/in-p'>t</a></p>"
        "</body></html>"
    )

    def test_parse_selector_xpath(self):
        assert parse_selector("//h4/a[@href]") == [
            ("h4", False, ()), ("a", True, (("href", "has", None),))
        ]
        assert parse_selector("//div//a") == [("div", False, ()), ("a", False, ())]
        assert parse_selector("/html/body/h4/a") == [
            ("html", False, ()), ("body", True, ()), ("h4", True, ()), ("a", True, ())
        ]

    def test_xpath_direct_child(self):
        links = parse_page(self.HTML, selector=parse_selector("//h4/a[@href]"))["links"]
        assert links == ["http://x.com/in-h4"]
        # div/a is NOT a direct child (span between) -> no match
        assert parse_page(self.HTML, selector=parse_selector("//div/a"))["links"] == []

    def test_xpath_descendant(self):
        links = parse_page(self.HTML, selector=parse_selector("//div//a"))["links"]
        assert links == ["http://x.com/in-div-span"]

    def test_css_descendant_and_child(self):
        assert parse_page(self.HTML, selector=parse_selector("div a"))["links"] == [
            "http://x.com/in-div-span"
        ]
        assert parse_page(self.HTML, selector=parse_selector("span > a"))["links"] == [
            "http://x.com/in-div-span"
        ]
        assert parse_page(self.HTML, selector=parse_selector("div > a"))["links"] == []


class TestStoreBackends:
    def test_make_store_local(self, spark, tmp_path):
        s = make_store(spark, base_dir=str(tmp_path / "st"))
        assert isinstance(s, FrontierStore)

    def test_iceberg_requires_catalog(self, spark):
        """Without the runtime jar/catalog conf the Iceberg backend
        fails fast with actionable flags instead of a Spark SQL error."""
        with pytest.raises(RuntimeError, match="spark.sql.catalog.crawl"):
            IcebergFrontierStore(spark, "crawl")
        with pytest.raises(RuntimeError):
            make_store(spark, backend="iceberg")

    def test_iceberg_interface_is_superset(self):
        for m in ("commit_round", "commit_seed", "frontier", "seen", "crawled",
                  "lineage", "manifest", "committed_round"):
            assert hasattr(IcebergFrontierStore, m)

    def test_doc_store_round_trip(self, spark, tmp_path):
        """S8 (redis_doc_store.rb:54-66): JSON docs keyed by canon_url."""
        store = FrontierStore(spark, str(tmp_path / "st"))
        docs = spark.createDataFrame(
            [("http://a/1", "t1", 3), ("http://a/2", "t2", 5)],
            "canon_url string, title string, n int",
        )
        store.commit_docs(0, docs)
        out = {r["canon_url"]: r["doc_json"] for r in store.docs(upto=0).collect()}
        assert out["http://a/1"] == '{"title":"t1","n":3}'
        assert len(out) == 2


class TestStreamingBloomDedup:
    def test_intra_batch_duplicates_counted_once(self):
        from cloud_crawler_spark.streaming.ingest import _BLOOM_M_BITS, _probe_and_set

        bits = np.zeros(_BLOOM_M_BITS // 8, dtype=np.uint8)
        h1 = np.array([7, 7, 7, 9], dtype=np.uint64)
        h2 = np.array([3, 3, 3, 4], dtype=np.uint64)
        assert _probe_and_set(bits, h1, h2) == 2  # {(7,3),(9,4)}
        assert _probe_and_set(bits, h1, h2) == 0  # all seen now
