"""functions/metadata — head-metadata extractor edge semantics.
q_page_metadata's oracle proves byte round-trip at corpus scale; these
pin the first-occurrence rules and malformed-input behavior."""

from cloud_crawler_spark.functions.metadata import _extract_one, with_metadata


def test_first_occurrence_wins_everywhere():
    html = b"""<html><head>
    <title>First</title><title>Second</title>
    <meta name="description" content="d1">
    <meta name="description" content="d2">
    <meta property="og:title" content="o1">
    <meta property="og:title" content="o2">
    <link rel="canonical" href="http://a/">
    <link rel="canonical" href="http://b/">
    </head></html>"""
    m = _extract_one(html)
    assert m["title"] == "First"
    assert m["description"] == "d1"
    assert m["og"] == {"title": "o1"}
    assert m["canonical"] == "http://a/"


def test_entities_unescaped_and_body_og_collected():
    html = (
        '<html><head><title>A &amp; B</title></head>'
        '<body><meta property="og:type" content="x &gt; y"></body></html>'
    )
    m = _extract_one(html)
    assert m["title"] == "A & B"
    assert m["og"] == {"type": "x > y"}


def test_missing_fields_are_null_and_garbage_is_safe():
    assert _extract_one("<p>no head</p>") == {
        "title": None, "description": None, "canonical": None, "og": {},
    }
    assert _extract_one(None)["title"] is None
    # invalid UTF-8 bytes: decoded with errors=ignore, never raises
    m = _extract_one(b"<title>ok\xff\xfe</title>")
    assert m["title"] == "ok"


def test_meta_without_content_ignored():
    m = _extract_one('<meta name="description"><meta property="og:a">')
    assert m["description"] is None and m["og"] == {}


def test_with_metadata_column(spark):
    df = spark.createDataFrame(
        [(1, b"<title> T </title>"), (2, b"")], "id long, html binary")
    rows = {r["id"]: r["metadata"] for r in with_metadata(df).collect()}
    assert rows[1]["title"] == "T"
    assert rows[2]["title"] is None
    assert rows[2]["og"] == {}
