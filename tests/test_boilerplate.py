"""Boilerplate removal (functions/boilerplate.py). End-to-end value
parity is pinned by the q_main_content oracle; these pin the block
segmentation and filter semantics."""

from __future__ import annotations

from cloud_crawler_spark.functions.boilerplate import (
    extract_main_text_py,
    segment_blocks,
    with_main_text,
)


class TestSegmentation:
    def test_blocks_in_document_order(self):
        html = "<p>one</p><div>two</div><p>three</p>"
        assert [b[1] for b in segment_blocks(html)] == ["one", "two", "three"]

    def test_nested_blocks_are_separate_segments(self):
        html = "<div>outer <p>inner</p> tail</div>"
        texts = {b[1] for b in segment_blocks(html)}
        assert "inner" in texts
        assert any("outer" in t for t in texts)

    def test_link_density(self):
        html = '<p><a href="/x">12345</a>67890</p>'
        (tag, text, d), = segment_blocks(html)
        assert text == "1234567890" and d == 0.5

    def test_script_style_skipped(self):
        html = "<p>keep</p><script>var x = 'no';</script><style>p{}</style>"
        assert [b[1] for b in segment_blocks(html)] == ["keep"]

    def test_bytes_none_and_malformed(self):
        assert segment_blocks(None) == []
        assert segment_blocks(b"<p>bytes ok</p>")[0][1] == "bytes ok"
        assert extract_main_text_py("<p>unclosed block with text") != ""


class TestFilter:
    def test_chrome_tags_dropped(self):
        html = (
            "<nav>navigation links here</nav><p>real content paragraph</p>"
            "<footer>copyright notice text</footer><aside>related links</aside>"
        )
        assert extract_main_text_py(html) == "real content paragraph"

    def test_link_dense_block_dropped(self):
        html = (
            '<div><a href="/1">lots</a><a href="/2">of</a>'
            '<a href="/3">linktext</a>.</div><p>body text stays here</p>'
        )
        assert extract_main_text_py(html) == "body text stays here"

    def test_short_block_dropped(self):
        html = "<p>ok</p><p>this one is long enough</p>"
        assert extract_main_text_py(html) == "this one is long enough"

    def test_threshold_knobs(self):
        html = '<p><a href="/x">half link</a> half text</p>'
        assert extract_main_text_py(html, max_link_density=0.3) == ""
        assert extract_main_text_py(html, max_link_density=0.6) != ""


class TestDataFrame:
    def test_with_main_text_column(self, spark):
        df = spark.createDataFrame(
            [(1, b"<nav>menu menu menu</nav><p>the actual article body</p>")],
            "id int, html binary",
        )
        out = with_main_text(df).collect()[0]
        assert out["main_text"] == "the actual article body"
