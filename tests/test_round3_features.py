"""Round-3 feature tests: full response-header capture, HTTP basic
auth, retry-count parity, proxy/timeout knobs, exact P3 selectors,
content-type gate case-insensitivity, CC non-convergence warning,
corpus conf scoping, fastparse internals guard, bloom cogroup crawl,
multimodal auto decode.

Reference anchors: page.rb:255-268 (headers in to_hash),
spec/fakeweb_helper.rb:83-89 (401/200 auth pair), http.rb:211-216
(retry loop), dsl_front_end.rb:55-60 (proxy/read_timeout knobs),
page.rb:123-136 (select_links_by selectors).
"""

from __future__ import annotations

import functools
import warnings

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.sources.http_fetch import (
    BasicAuthTransport,
    DictTransport,
    HttpFetcher,
    UrllibTransport,
)
from tests.helpers import crawled_names, make_corpus, make_seeds

_U = "http://www.example.com"


def _seed(spark):
    return make_seeds(spark, [f"{_U}/0"])


# ------------------------------------------------------------- headers


class TestHeaderCapture:
    SITE = {
        f"{_U}/0": {
            "code": 200,
            "body": b"<html><a href='/1'>x</a></html>",
            "content_type": "text/html",
            "headers": {
                "content-type": ["text/html; charset=utf-8"],
                "last-modified": ["Tue, 01 Apr 2013 00:00:00 GMT"],
                "x-robots-tag": ["noarchive", "nosnippet"],
            },
        },
        f"{_U}/1": {"code": 200, "body": b"leaf", "content_type": "text/html"},
    }

    def _crawl(self, spark):
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, self.SITE)
        )
        corpus = make_corpus(spark, {})
        return crawl(spark, corpus, _seed(spark), CrawlConfig(fetcher=fetcher))

    def test_full_headers_stored(self, spark):
        res = self._crawl(spark)
        row = res.crawled.where(F.col("canon_url") == f"{_U}/0").first()
        h = dict(row["headers"])
        assert list(h["last-modified"]) == ["Tue, 01 Apr 2013 00:00:00 GMT"]
        assert list(h["x-robots-tag"]) == ["noarchive", "nosnippet"]
        assert list(h["content-type"]) == ["text/html; charset=utf-8"]

    def test_headers_default_when_absent(self, spark):
        """A transport that sets only content_type still yields the
        1-key header map (page.rb:66-67 default)."""
        res = self._crawl(spark)
        row = res.crawled.where(F.col("canon_url") == f"{_U}/1").first()
        assert dict(row["headers"]) == {"content-type": ["text/html"]}

    def test_to_hash_carries_full_headers(self, spark):
        from cloud_crawler_spark.page import page_from_hash, page_to_hash

        res = self._crawl(spark)
        row = res.crawled.where(F.col("canon_url") == f"{_U}/0").first()
        h = page_to_hash(row)
        assert h["headers"]["x-robots-tag"] == ["noarchive", "nosnippet"]
        rt = page_from_hash(h)
        assert rt["headers"] == h["headers"]

    def test_corpus_rows_have_content_type_header(self, spark):
        corpus = make_corpus(spark, {"0": {"links": ["1"]}, "1": {}})
        res = crawl(spark, corpus, _seed(spark), CrawlConfig())
        row = res.crawled.where("code = 200").first()
        assert list(dict(row["headers"])["content-type"]) == ["text/html"]


# ------------------------------------------------------------ basic auth


class TestBasicAuth:
    """fakeweb_helper.rb:83-89: the same URL serves 401 bare and 200
    with credentials. Transport lives in the package
    (http_fetch.BasicAuthTransport) so Spark workers can unpickle it."""

    def test_401_retried_with_credentials(self, spark):
        site = {f"{_U}/0": True}
        fetcher = HttpFetcher(
            transport_factory=functools.partial(BasicAuthTransport, site),
            credentials={"www.example.com": ("user", "pass")},
        )
        corpus = make_corpus(spark, {})
        res = crawl(spark, corpus, _seed(spark), CrawlConfig(fetcher=fetcher))
        row = res.crawled.first()
        assert row["code"] == 200
        # urlsafe Basic of user:pass
        import base64

        expected = "Basic " + base64.b64encode(b"user:pass").decode()
        assert expected in bytes(row["html"]).decode()

    def test_401_without_credentials_stored_as_is(self, spark):
        site = {f"{_U}/0": True}
        fetcher = HttpFetcher(
            transport_factory=functools.partial(BasicAuthTransport, site)
        )
        corpus = make_corpus(spark, {})
        res = crawl(spark, corpus, _seed(spark), CrawlConfig(fetcher=fetcher))
        assert res.crawled.first()["code"] == 401

    def test_wrong_host_credentials_not_sent(self, spark):
        site = {f"{_U}/0": True}
        fetcher = HttpFetcher(
            transport_factory=functools.partial(BasicAuthTransport, site),
            credentials={"other.com": ("u", "p")},
        )
        corpus = make_corpus(spark, {})
        res = crawl(spark, corpus, _seed(spark), CrawlConfig(fetcher=fetcher))
        assert res.crawled.first()["code"] == 401


# ---------------------------------------------------------- retry parity


class TestRetryParity:
    """http.rb:211-216: initial attempt + `retries` retries = N+1
    total attempts."""

    def test_recovers_after_exactly_retries_failures(self, spark):
        # 3 failures then success: reference semantics (1+3 attempts)
        # recover; the old off-by-one (3 attempts) did not
        site = {f"{_U}/0": {"code": 200, "body": b"ok", "content_type": "text/html"}}
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site, 3), retries=3
        )
        corpus = make_corpus(spark, {})
        res = crawl(spark, corpus, _seed(spark), CrawlConfig(fetcher=fetcher))
        row = res.crawled.first()
        assert row["code"] == 200 and row["fetched"]

    def test_gives_up_after_retries_plus_one(self, spark):
        site = {f"{_U}/0": {"code": 200, "body": b"ok", "content_type": "text/html"}}
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site, 4), retries=3
        )
        corpus = make_corpus(spark, {})
        res = crawl(spark, corpus, _seed(spark), CrawlConfig(fetcher=fetcher))
        row = res.crawled.first()
        assert row["code"] is None and not row["fetched"]
        assert row["error"]


# ------------------------------------------------------- proxy / timeout


class TestTransportKnobs:
    def test_urllib_transport_proxy_handler(self):
        t = UrllibTransport(timeout=7.5, proxy_host="proxy.local", proxy_port=3128)
        import urllib.request

        proxies = [
            h.proxies
            for h in t.opener.handlers
            if isinstance(h, urllib.request.ProxyHandler)
        ]
        assert proxies and proxies[0]["http"] == "http://proxy.local:3128"
        assert proxies[0]["https"] == "http://proxy.local:3128"
        assert t.timeout == 7.5

    def test_fetcher_surfaces_read_timeout_and_proxy(self):
        f = HttpFetcher(read_timeout=12.0, proxy_host="p.local", proxy_port=8080)
        t = f.transport_factory()
        assert isinstance(t, UrllibTransport)
        assert t.timeout == 12.0
        import urllib.request

        assert any(
            isinstance(h, urllib.request.ProxyHandler) and
            h.proxies.get("http") == "http://p.local:8080"
            for h in t.opener.handlers
        )

    def test_no_proxy_by_default(self):
        t = UrllibTransport()
        import urllib.request

        # no explicit ProxyHandler with our proxies; urllib installs a
        # default env-based one — assert ours is absent by checking no
        # handler proxies to a configured host
        assert not any(
            getattr(h, "proxies", {}).get("http", "").endswith(":3128")
            for h in t.opener.handlers
        )


# ------------------------------------------------------ exact selectors


class TestExactSelectors:
    from cloud_crawler_spark.functions.parse import parse_page, parse_selector

    def test_multi_gap_descendant_exact(self):
        from cloud_crawler_spark.functions.parse import parse_page, parse_selector

        # greedy right-to-left picks the NEAREST span (parent ul) and
        # fails; the exact matcher must find the outer span whose
        # parent is div
        html = (
            "<div><span><ul><span><li><a href='/win'>t</a>"
            "</li></span></ul></span></div>"
        )
        steps = parse_selector("//div/span//li/a")
        assert parse_page(html, selector=steps)["links"] == ["/win"]

    def test_direct_chain_still_exact(self):
        from cloud_crawler_spark.functions.parse import parse_page, parse_selector

        html = "<h4><a href='/in'>x</a></h4><a href='/out'>y</a>"
        steps = parse_selector("//h4/a[@href]")
        assert parse_page(html, selector=steps)["links"] == ["/in"]

    def test_xpath_attribute_equality_predicate(self):
        from cloud_crawler_spark.functions.parse import parse_page, parse_selector

        html = (
            '<div class="x"><p><a href="/in">t</a></p></div>'
            '<div class="y"><p><a href="/out">t</a></p></div>'
        )
        steps = parse_selector("//div[@class='x']//p/a")
        assert parse_page(html, selector=steps)["links"] == ["/in"]
        # XPath @class equality is WHOLE-string (libxml2 semantics)
        html2 = '<div class="x top"><p><a href="/multi">t</a></p></div>'
        assert parse_page(html2, selector=steps)["links"] == []
        assert parse_page(
            html2, selector=parse_selector("//div[@class='x top']//p/a")
        )["links"] == ["/multi"]

    def test_xpath_attribute_presence_predicate(self):
        from cloud_crawler_spark.functions.parse import parse_page, parse_selector

        html = (
            '<div data-k="1"><a href="/in">t</a></div>'
            "<div><a href='/out'>t</a></div>"
        )
        steps = parse_selector("//div[@data-k]/a")
        assert parse_page(html, selector=steps)["links"] == ["/in"]

    def test_xpath_multi_predicates_one_step(self):
        from cloud_crawler_spark.functions.parse import parse_page, parse_selector

        html = (
            '<div id="m" data-k="1"><a href="/in">t</a></div>'
            '<div id="m"><a href="/out">t</a></div>'
        )
        steps = parse_selector("//div[@id='m'][@data-k]/a")
        assert parse_page(html, selector=steps)["links"] == ["/in"]

    def test_positional_predicate_rejected(self):
        from cloud_crawler_spark.functions.parse import parse_selector

        with pytest.raises(ValueError):
            parse_selector("//div[1]/a")
        with pytest.raises(ValueError):
            parse_selector("//a[contains(@href,'x')]")

    def test_css_class_selector(self):
        from cloud_crawler_spark.functions.parse import parse_page, parse_selector

        # CSS .cls is TOKEN membership (unlike XPath @class equality)
        html = (
            '<div class="cls top"><a href="/in">t</a></div>'
            '<div class="other"><a href="/out">t</a></div>'
        )
        assert parse_page(html, selector=parse_selector("div.cls a"))["links"] == ["/in"]
        assert parse_page(html, selector=parse_selector(".top > a"))["links"] == ["/in"]

    def test_css_id_and_attr_selectors(self):
        from cloud_crawler_spark.functions.parse import parse_page, parse_selector

        html = (
            '<div id="main"><span><a href="/in">t</a></span></div>'
            '<div id="nav"><a href="/out" rel="nofollow">t</a></div>'
        )
        assert parse_page(html, selector=parse_selector("#main a"))["links"] == ["/in"]
        assert parse_page(html, selector=parse_selector("a[rel='nofollow']"))["links"] == ["/out"]
        assert parse_page(html, selector=parse_selector("a[rel]"))["links"] == ["/out"]
        # pseudo-classes still rejected
        with pytest.raises(ValueError):
            parse_selector("div:hover a")

    def test_href_predicate_accepted(self):
        from cloud_crawler_spark.functions.parse import parse_selector

        steps = parse_selector("//h4/a[@href]")
        assert steps[-1][0] == "a"

    def test_link_selector_gates_frontier_expansion(self, spark):
        """select_links_by wired as focus_crawl (dsl_core.rb:195,
        examples/link_selector.rb): only selector-matched links expand,
        and the stored page's links column holds only those."""
        body0 = (
            "<html><body>"
            '<div class="follow"><a href="http://www.example.com/1">in</a></div>'
            '<a href="http://www.example.com/2">out</a>'
            "</body></html>"
        )
        graph = {"0": {"body": body0}, "1": {}, "2": {}}
        seeds = make_seeds(spark, ["http://www.example.com/0"])

        res = crawl(spark, make_corpus(spark, graph), seeds,
                    CrawlConfig(link_selector="div.follow a"))
        assert crawled_names(res) == {"0", "1"}
        links0 = res.crawled.where("canon_url = 'http://www.example.com/0'") \
            .select(F.explode("links")).collect()
        assert [r[0] for r in links0] == ["http://www.example.com/1"]

        # same crawl unselected follows both
        res_all = crawl(spark, make_corpus(spark, graph), seeds)
        assert crawled_names(res_all) == {"0", "1", "2"}

        # XPath form, attribute-equality predicate
        res_x = crawl(spark, make_corpus(spark, graph), seeds,
                      CrawlConfig(link_selector="//div[@class='follow']/a[@href]"))
        assert crawled_names(res_x) == {"0", "1"}


# ------------------------------------------- content-type gate case (F8)


class TestContentTypeCase:
    def test_uppercase_content_type_is_parsed(self, spark):
        site = {
            f"{_U}/0": {
                "code": 200,
                "body": b"<html><a href='/1'>x</a></html>",
                "content_type": "Text/HTML",
            },
            f"{_U}/1": {"code": 200, "body": b"<html>leaf</html>",
                        "content_type": " text/html "},
        }
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site)
        )
        corpus = make_corpus(spark, {})
        res = crawl(spark, corpus, _seed(spark), CrawlConfig(fetcher=fetcher))
        got = {r["canon_url"] for r in res.crawled.where("code=200").collect()}
        # /1 only reachable if /0's Text/HTML body was parsed for links
        assert got == {f"{_U}/0", f"{_U}/1"}


# ------------------------------------------------- CC convergence warning


class TestCCNonConvergence:
    def test_warns_when_unconverged(self, spark):
        from cloud_crawler_spark.operators.dedup import connected_components

        # a chain 0-1-2-...-7 needs ~diameter rounds; max_iter=1 cannot
        # converge and must warn instead of silently splitting
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            connected_components(edges, max_iter=1)
        assert any("converge" in str(x.message).lower() for x in w)

    def test_no_warning_when_converged(self, spark):
        from cloud_crawler_spark.operators.dedup import connected_components

        edges = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = connected_components(edges, max_iter=20)
            assert out.count() == 2
        assert not any("converge" in str(x.message).lower() for x in w)


# ---------------------------------------------------- corpus conf scoping


class TestCorpusConfScoped:
    def test_session_conf_restored(self, spark):
        from cloud_crawler_spark.sources.corpus import prepare_corpus

        key = "spark.sql.inMemoryColumnarStorage.compressed"
        spark.conf.set(key, "true")
        try:
            pages = spark.createDataFrame(
                [("http://x.com/a", None, b"<html></html>", "t", "en")],
                "url string, warc_ts timestamp, html binary, text string, lang string",
            )
            prepare_corpus(pages)
            assert spark.conf.get(key) == "true"
        finally:
            spark.conf.set(key, "false")


# ------------------------------------------------- fastparse import guard


class TestFastparseGuard:
    def test_guard_flag_exists_and_enabled_here(self):
        from cloud_crawler_spark.functions import fastparse

        # in this environment (3.11+) the fast path must be available
        assert fastparse._FAST_AVAILABLE is True

    def test_fast_parse_bails_when_unavailable(self, monkeypatch):
        from cloud_crawler_spark.functions import fastparse

        monkeypatch.setattr(fastparse, "_FAST_AVAILABLE", False)
        assert fastparse.fast_parse("<html><a href='/x'>t</a></html>") is None


# ------------------------------------------------- bloom cogroup crawl


class TestBloomCogroupCrawl:
    def test_crawl_bloom_cogroup_matches_exact(self, spark):
        """use_bloom with broadcast_max_bytes=0 forces the cogroup
        probe (seen.py cogroup path) through a real crawl; output must
        be byte-identical to the exact anti-join crawl."""
        graph = {"0": {"links": [str(i) for i in range(1, 9)]}} | {
            str(i): {"links": [str((i * 3) % 9)]} for i in range(1, 9)
        }
        corpus = make_corpus(spark, graph)
        seeds = make_seeds(spark, [f"{_U}/0"])
        seen0 = spark.createDataFrame(
            [(f"{_U}/{i}",) for i in (4, 5)], "canon_url string"
        )
        exact = crawl(
            spark, corpus, seeds,
            CrawlConfig(use_bloom=False), initial_seen=seen0,
        )
        bloom = crawl(
            spark, corpus, seeds,
            CrawlConfig(use_bloom=True, bloom_broadcast_max_bytes=0),
            initial_seen=seen0,
        )
        cols = ["canon_url", "code", "depth", "rank"]
        a = sorted(map(tuple, exact.crawled.select(*cols).collect()))
        b = sorted(map(tuple, bloom.crawled.select(*cols).collect()))
        assert a == b and a  # identical and non-empty
        assert crawled_names(exact) == crawled_names(bloom)


# ------------------------------------------------- multimodal auto decode


class TestMultimodalAuto:
    def _media(self, spark):
        from cloud_crawler_spark.functions.multimodal import synth_media

        return synth_media(spark, 6)

    def test_auto_falls_back_to_stub_without_pil(self, spark):
        from cloud_crawler_spark.functions.multimodal import extract_features

        try:
            import PIL  # noqa: F401

            pytest.skip("PIL present: auto takes the real path here")
        except ImportError:
            pass
        media = self._media(spark)
        auto = extract_features(media, decode_stub="auto").drop("feature")
        stub = extract_features(media, decode_stub=True).drop("feature")
        assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, stub.collect()))

    def test_explicit_false_raises_without_pil(self, spark):
        from cloud_crawler_spark.functions.multimodal import extract_features

        try:
            import PIL  # noqa: F401

            pytest.skip("PIL present")
        except ImportError:
            pass
        media = self._media(spark)
        with pytest.raises(Exception):
            extract_features(media, decode_stub=False).collect()

    def test_real_decode_with_pil(self, spark):
        pytest.importorskip("PIL")
        from cloud_crawler_spark.functions.multimodal import extract_features

        media = self._media(spark)
        out = extract_features(media, decode_stub=False)
        assert out.count() == media.count()


# ---------------------------------------- anchor text (text_for gate)


class TestAnchorText:
    """focus_crawl text_for filtering (crossfit_crawl.rb:56-60:
    ``page.links.keep_if { |lnk| @page.text_for(lnk) =~ /Level 1/i }``)
    — the reference's @doms_for_link maps href -> dom, LAST occurrence
    per href wins (page.rb @doms_for_link hash assignment)."""

    def test_collect_anchors_basic(self):
        from cloud_crawler_spark.functions.parse import parse_page

        html = (
            "<html><body>"
            '<a href="/a">Alpha text</a>'
            '<a href="/b"><b>Bold</b> beta</a>'
            '<a href="/c"></a>'
            "</body></html>"
        )
        r = parse_page(html, collect_anchors=True)
        assert r["links"] == ["/a", "/b", "/c"]
        assert r["anchors"] == ["Alpha text", "Bold beta", ""]

    def test_last_occurrence_wins_and_unclosed(self):
        from cloud_crawler_spark.functions.parse import parse_page

        # duplicate href: links dedupe first-occurrence (page.rb:134),
        # anchor text is the LAST occurrence's (hash assignment)
        html = (
            '<a href="/x">first</a> mid <a href="/x">second</a>'
            '<a href="/y">tail with no close'
        )
        r = parse_page(html, collect_anchors=True)
        assert r["links"] == ["/x", "/y"]
        assert r["anchors"][0] == "second"
        assert r["anchors"][1] == "tail with no close"

    def test_implicit_close_by_next_anchor(self):
        from cloud_crawler_spark.functions.parse import parse_page

        html = '<a href="/p">one<a href="/q">two</a>'
        r = parse_page(html, collect_anchors=True)
        assert r["links"] == ["/p", "/q"]
        assert r["anchors"] == ["one", "two"]

    def test_no_anchor_key_without_flag(self):
        from cloud_crawler_spark.functions.parse import parse_page

        r = parse_page('<a href="/a">t</a>')
        assert "anchors" not in r

    def test_anchor_pattern_gates_frontier_expansion(self, spark):
        body0 = (
            "<html><body>"
            '<a href="http://www.example.com/1">Level 1 Cert</a>'
            '<a href="http://www.example.com/2">About us</a>'
            '<a href="http://www.example.com/3">level 1 trainers</a>'
            "</body></html>"
        )
        graph = {"0": {"body": body0}, "1": {}, "2": {}, "3": {}}
        seeds = make_seeds(spark, [f"{_U}/0"])

        res = crawl(spark, make_corpus(spark, graph), seeds,
                    CrawlConfig(anchor_pattern="(?i)level 1"))
        assert crawled_names(res) == {"0", "1", "3"}
        links0 = res.crawled.where(f"canon_url = '{_U}/0'") \
            .select(F.explode("links")).collect()
        assert sorted(r[0] for r in links0) == [
            f"{_U}/1", f"{_U}/3"
        ]

        # unfiltered crawl follows all three
        res_all = crawl(spark, make_corpus(spark, graph), seeds)
        assert crawled_names(res_all) == {"0", "1", "2", "3"}

    def test_anchor_pattern_composes_with_selector(self, spark):
        body0 = (
            "<html><body>"
            '<div class="follow">'
            '<a href="http://www.example.com/1">keep me</a>'
            '<a href="http://www.example.com/2">drop me</a>'
            "</div>"
            '<a href="http://www.example.com/3">keep me</a>'
            "</body></html>"
        )
        graph = {"0": {"body": body0}, "1": {}, "2": {}, "3": {}}
        seeds = make_seeds(spark, [f"{_U}/0"])
        res = crawl(spark, make_corpus(spark, graph), seeds,
                    CrawlConfig(link_selector="div.follow a",
                                anchor_pattern="keep"))
        assert crawled_names(res) == {"0", "1"}


class TestHashSplit:
    def _docs(self, spark, n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.expr("id div 4").alias("cluster"),
        )

    def test_cluster_members_share_split(self, spark):
        from cloud_crawler_spark.operators.sampling import hash_split

        out = hash_split(
            self._docs(spark, 400),
            {"train": 980, "val": 10, "test": 10},
            key_col="cluster",
        )
        per = out.groupBy("cluster").agg(
            F.countDistinct("split").alias("ns")
        )
        assert per.where("ns > 1").count() == 0

    def test_weights_roughly_hold_and_deterministic(self, spark):
        from cloud_crawler_spark.operators.sampling import hash_split

        d = spark.range(5000).select(F.col("id").alias("doc_id"))
        out = hash_split(
            d, {"train": 900, "val": 50, "test": 50}, key_col="doc_id"
        )
        counts = {r["split"]: r["c"] for r in
                  out.groupBy("split").agg(F.count("*").alias("c")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > 4000
        assert 100 < counts["val"] + counts["test"] < 900
        again = hash_split(
            d, {"train": 900, "val": 50, "test": 50}, key_col="doc_id"
        )
        assert out.exceptAll(again).count() == 0

    def test_salt_versions_the_split(self, spark):
        from cloud_crawler_spark.operators.sampling import hash_split

        d = spark.range(1000).select(F.col("id").alias("doc_id"))
        a = hash_split(d, {"train": 500, "test": 500}, key_col="doc_id")
        b = hash_split(d, {"train": 500, "test": 500}, key_col="doc_id",
                       salt="split-v2")
        assert a.exceptAll(b).count() > 0

    def test_rejects_bad_weights(self, spark):
        import pytest as _pt

        from cloud_crawler_spark.operators.sampling import hash_split

        with _pt.raises(ValueError):
            hash_split(spark.range(1), {"train": 999}, key_col="id")


class TestChunkDocuments:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_windows_and_overlap(self, spark):
        from cloud_crawler_spark.functions.text import chunk_documents

        text = " ".join(f"w{i}" for i in range(10))
        out = sorted(
            (r["chunk_id"], r["n_tokens"], r["chunk"])
            for r in chunk_documents(
                self._docs(spark, [(0, text)]),
                chunk_tokens=4, overlap=1,
            ).collect()
        )
        # stride 3: starts 0,3,6,9
        assert [c[0] for c in out] == [0, 1, 2, 3]
        assert out[0] == (0, 4, "w0 w1 w2 w3")
        assert out[1] == (1, 4, "w3 w4 w5 w6")
        assert out[3] == (3, 1, "w9")  # short tail kept, never empty

    def test_empty_doc_yields_no_chunks(self, spark):
        from cloud_crawler_spark.functions.text import chunk_documents

        out = chunk_documents(
            self._docs(spark, [(0, ""), (1, "a b")]),
            chunk_tokens=4, overlap=1,
        ).collect()
        assert {r["doc_id"] for r in out} == {1}

    def test_short_doc_single_chunk(self, spark):
        from cloud_crawler_spark.functions.text import chunk_documents

        out = chunk_documents(
            self._docs(spark, [(0, "a b c")]), chunk_tokens=10, overlap=2
        ).collect()
        assert len(out) == 1 and out[0]["chunk"] == "a b c"

    def test_rejects_overlap_ge_chunk(self, spark):
        import pytest as _pt

        from cloud_crawler_spark.functions.text import chunk_documents

        with _pt.raises(ValueError):
            chunk_documents(self._docs(spark, [(0, "x")]),
                            chunk_tokens=4, overlap=4)


# ------------------------------------------------------------ gzip


class TestGzipTransfer:
    def test_maybe_gunzip(self):
        import gzip

        from cloud_crawler_spark.sources.http_fetch import _maybe_gunzip

        raw = b"<html>hello compressed world</html>"
        gz = gzip.compress(raw)
        assert _maybe_gunzip(gz, "gzip") == (raw, False)
        assert _maybe_gunzip(gz, " GZIP ") == (raw, False)  # header case/space
        assert _maybe_gunzip(raw, None) == (raw, False)     # identity untouched
        assert _maybe_gunzip(raw, "identity") == (raw, False)
        assert _maybe_gunzip(None, "gzip") == (None, False)
        import pytest as _pt
        with _pt.raises(Exception):
            _maybe_gunzip(b"not gzip at all", "gzip")

    def test_maybe_gunzip_decoded_cap(self):
        """Decompression-bomb guard: the cap bounds the DECODED size
        via streaming zlib, so a tiny transfer inflating huge stops at
        max_bytes instead of materializing in the python worker."""
        import gzip

        from cloud_crawler_spark.sources.http_fetch import _maybe_gunzip

        bomb = gzip.compress(b"\x00" * 4_000_000)   # ~4 KB transfer
        body, truncated = _maybe_gunzip(bomb, "gzip", max_bytes=1000)
        assert truncated and body == b"\x00" * 1000
        # under the cap: untouched
        small = gzip.compress(b"abc" * 10)
        assert _maybe_gunzip(small, "gzip", max_bytes=1000) == (b"abc" * 10, False)
        # identity body over the cap
        assert _maybe_gunzip(b"x" * 50, None, max_bytes=10) == (b"x" * 10, True)

    def test_maybe_gunzip_gzip_parity(self):
        """gzip.decompress parity pinned (code-review r3 findings): a
        server-truncated stream RAISES into the retry loop; a stream
        cut by OUR OWN read cap returns partial+flagged instead;
        multi-member streams decode fully."""
        import gzip

        import pytest as _pt

        from cloud_crawler_spark.sources.http_fetch import _maybe_gunzip

        import hashlib

        # incompressible deterministic body so a 40-byte prefix is
        # genuinely mid-stream (repetitive text gzips to <40 bytes)
        doc = b"".join(hashlib.sha256(bytes([i])).digest() for i in range(40))
        cut = gzip.compress(doc)[:40]  # connection dropped mid-body
        with _pt.raises(EOFError):
            _maybe_gunzip(cut, "gzip")
        with _pt.raises(EOFError):
            _maybe_gunzip(cut, "gzip", max_bytes=10_000)
        # same cut caused by the transport's OWN capped read: partial
        # bytes come back flagged, no retry storm
        body, truncated = _maybe_gunzip(cut, "gzip", raw_truncated=True)
        assert truncated and doc.startswith(body)
        # RFC 1952 multi-member (range-assembled caches): all members
        multi = gzip.compress(b"AAA") + gzip.compress(b"BBB")
        assert _maybe_gunzip(multi, "gzip") == (b"AAABBB", False)
        assert _maybe_gunzip(multi, "gzip", max_bytes=1000) == (b"AAABBB", False)
        assert _maybe_gunzip(multi, "gzip", max_bytes=4) == (b"AAAB", True)
        # trailing zero padding after the last member is legal
        assert _maybe_gunzip(gzip.compress(b"Z") + b"\x00" * 8, "gzip") == (b"Z", False)

    def test_live_roundtrip_via_local_server(self):
        """A localhost server negotiating gzip: the transport must
        advertise Accept-Encoding: gzip and store DECODED bytes."""
        import gzip
        import http.server
        import threading

        raw = b"<html><body>" + b"spark " * 200 + b"</body></html>"
        seen_headers = {}

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                seen_headers.update(self.headers.items())
                body = gzip.compress(raw)
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            tr = UrllibTransport(timeout=10)
            resp = tr(f"http://127.0.0.1:{srv.server_port}/x", None)
            assert resp.code == 200
            assert resp.body == raw  # decoded, not the gzip bytes
            assert seen_headers.get("Accept-Encoding") == "gzip"
            # headers hash keeps the transfer coding as received
            assert resp.headers.get("content-encoding") == ["gzip"]
        finally:
            srv.shutdown()
