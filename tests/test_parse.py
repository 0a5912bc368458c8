"""HTML parse goldens — the byte-identical text contract (FIXTURES.md
scenario 14) and link-extraction semantics (page.rb:115-136).
Pure Python — no Spark session needed."""

from cloud_crawler_spark.functions.parse import (
    extract_links_py,
    extract_text_py,
    parse_page,
)


class TestTextExtraction:
    def test_concatenation_of_text_nodes(self):
        html = "<html><head><title>T</title></head><body><p>a</p><div>b<span>c</span></div></body></html>"
        # Nokogiri doc.text concatenates ALL text nodes incl. title
        assert extract_text_py(html) == "Tabc"

    def test_entities_unescaped(self):
        assert extract_text_py("<p>a &amp; b &#233;</p>") == "a & b é"

    def test_invalid_utf8_dropped(self):
        # Iconv UTF-8//IGNORE semantics (page.rb:58): invalid byte
        # sequences are dropped, not replaced
        html = b"<p>ok\xff\xfezz</p>"
        assert extract_text_py(html) == "okzz"

    def test_strip_leading_trailing_whitespace(self):
        assert extract_text_py("<body>  \n hello \t </body>") == "hello"

    def test_mixed_whitespace_interior_preserved(self):
        # only the ENDS are stripped (page.rb:111-113 strip)
        assert extract_text_py("<p> a  b </p><p> c </p>") == "a  b  c"

    def test_empty_and_none(self):
        assert extract_text_py(b"") == ""
        assert extract_text_py(None) == ""

    def test_exact_bytes_golden(self):
        html = (
            "<html><head><title>Page X</title></head>"
            "<body><h1>Head</h1><p>one &lt;two&gt; three</p></body></html>"
        )
        assert extract_text_py(html).encode() == b"Page XHeadone <two> three"


class TestLinkExtraction:
    def test_document_order(self):
        html = '<a href="/b">B</a><a href="/a">A</a><a href="/c">C</a>'
        assert extract_links_py(html) == ["/b", "/a", "/c"]

    def test_first_occurrence_dedupe(self):
        # page.rb:134 uniq! keeps first occurrence in document order
        html = '<a href="/x">1</a><a href="/y">2</a><a href="/x">3</a>'
        assert extract_links_py(html) == ["/x", "/y"]

    def test_empty_href_skipped(self):
        html = '<a href="">e</a><a>none</a><a href="/ok">ok</a>'
        assert extract_links_py(html) == ["/ok"]

    def test_base_href_extracted(self):
        p = parse_page('<head><base href="http://b.com/dir/" /></head><a href="x">x</a>')
        assert p["base_href"] == "http://b.com/dir/"
        assert p["links"] == ["x"]

    def test_scoped_extraction(self):
        # select_links_by("//h4/a[@href]") equivalent
        html = '<h4><a href="/in">in</a></h4><p><a href="/out">out</a></p>'
        assert parse_page(html, within_tag="h4")["links"] == ["/in"]

    def test_malformed_html_no_crash(self):
        assert extract_links_py("<a href='/x'><b><i>gar<bage</a>") == ["/x"]
        assert extract_text_py("<<<>>>") is not None

    def test_title(self):
        assert parse_page("<title> Hi there </title>")["title"] == "Hi there"


class TestDomSkeleton:
    """Structural template fingerprint (functions/parse.dom_skeleton /
    template_clusters): tag-sequence identity, text/attr invariance,
    prefix cap, and the (host, skeleton) grouping."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "host string, html binary")

    def test_same_template_same_skeleton(self, spark):
        from cloud_crawler_spark.functions.parse import dom_skeleton

        a = b"<html><body><div class='x'><p>alpha text</p></div></body></html>"
        b = b'<html><body><div id="y"><p>completely different</p></div></body></html>'
        c = b"<html><body><ul><li>other shape</li></ul></body></html>"
        out = (
            self._df(spark, [("h", a), ("h", b), ("h", c)])
            .select(dom_skeleton().alias("sk"))
            .collect()
        )
        sks = [r["sk"] for r in out]
        assert sks[0] == sks[1] != sks[2]  # attrs/text ignored, tags matter

    def test_end_tags_and_case_ignored(self, spark):
        from cloud_crawler_spark.functions.parse import dom_skeleton

        a = b"<HTML><BODY><P>x</P></BODY></HTML>"
        b = b"<html><body><p>y"
        out = (
            self._df(spark, [("h", a), ("h", b)])
            .select(dom_skeleton().alias("sk"))
            .collect()
        )
        assert out[0]["sk"] == out[1]["sk"]

    def test_prefix_cap(self, spark):
        from cloud_crawler_spark.functions.parse import dom_skeleton

        long_a = b"<html>" + b"<div></div>" * 300 + b"<p></p>"
        long_b = b"<html>" + b"<div></div>" * 300 + b"<span></span>"
        out = (
            self._df(spark, [("h", long_a), ("h", long_b)])
            .select(dom_skeleton(max_tags=200).alias("sk"))
            .collect()
        )
        assert out[0]["sk"] == out[1]["sk"]  # divergence past the cap invisible

    def test_template_clusters_grouping(self, spark):
        from cloud_crawler_spark.functions.parse import template_clusters

        t1 = b"<html><body><div><p>a</p></div></body></html>"
        t1b = b"<html><body><div><p>bbb</p></div></body></html>"
        t2 = b"<html><body><table><tr><td>c</td></tr></table></body></html>"
        df = self._df(
            spark,
            [("h1", t1), ("h1", t1b), ("h1", t2), ("h2", t1)],
        )
        rows = template_clusters(df, min_pages=2).collect()
        # only h1's t1-shaped pair survives min_pages=2; h2's singleton
        # and h1's lone table page drop
        assert len(rows) == 1
        assert rows[0]["host"] == "h1" and rows[0]["n_pages"] == 2
