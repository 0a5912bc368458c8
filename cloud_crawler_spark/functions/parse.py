"""HTML parsing: link extraction, text extraction, title, <base href>.

Re-expresses the reference's Nokogiri-based parse (page.rb:143-149) on
the Python stdlib ``html.parser`` (lxml is unavailable in this
environment; the semantics below are pinned by golden tests, which is
what the byte-identical contract actually requires):

* ``extract_links`` = ``doc.search("//a[@href]")`` in document order,
  skipping nil/empty hrefs, first-occurrence dedupe (``@links.uniq!``,
  page.rb:115-136 and :134).
* ``extract_text`` = Nokogiri ``doc.text`` semantics: concatenation of
  every text node in document order (including <title>), entities
  unescaped, then the Iconv ``UTF-8//IGNORE`` round trip (drop invalid
  byte sequences) and ``strip`` (page.rb:109-113, dsl_core.rb:199-205).
* ``<base href>`` extraction for absolutization (page.rb:217-225).

All UDFs are Arrow-batched pandas UDFs over the BINARY ``html`` column
(one vectorized call per batch — no per-row Python UDFs).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Elements whose text Nokogiri's doc.text DOES include: all of them —
# script/style/title contents are text nodes too. We match that.

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _PageParser(HTMLParser):
    """One pass: links (document order), base href, title, text."""

    def __init__(self, within_tag: str | None = None):
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self.base_href: str | None = None
        self.title_parts: list[str] = []
        self.text_parts: list[str] = []
        self._in_title = False
        self._stack: list[str] = []
        self._within = within_tag  # optional CSS-ish scope, e.g. 'h4'

    def handle_starttag(self, tag, attrs):
        if tag not in _VOID:
            self._stack.append(tag)
        if tag == "a":
            if self._within is None or self._within in self._stack:
                href = dict(attrs).get("href")
                if href:  # skip nil/empty (page.rb:127-129)
                    self.links.append(href)
        elif tag == "base" and self.base_href is None:
            href = dict(attrs).get("href")
            if href:
                self.base_href = href
        elif tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if self._stack and self._stack[-1] == tag:
            self._stack.pop()
        elif tag in self._stack:
            while self._stack and self._stack[-1] != tag:
                self._stack.pop()
            if self._stack:
                self._stack.pop()
        if tag == "title":
            self._in_title = False

    def handle_data(self, data):
        self.text_parts.append(data)
        if self._in_title:
            self.title_parts.append(data)


def _decode(html) -> str:
    """BINARY/str -> str with Iconv UTF-8//IGNORE semantics (drop
    invalid byte sequences; page.rb:58,109-113)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode("utf-8", errors="ignore")
    return str(html)


def parse_page(html, within_tag: str | None = None) -> dict:
    p = _PageParser(within_tag=within_tag)
    try:
        p.feed(_decode(html))
        p.close()
    except Exception:
        pass
    # first-occurrence dedupe, document order (page.rb:134 uniq!)
    seen: set[str] = set()
    links: list[str] = []
    for h in p.links:
        if h not in seen:
            seen.add(h)
            links.append(h)
    text = "".join(p.text_parts)
    # encode round trip: drop anything not UTF-8-encodable, then strip
    text = text.encode("utf-8", errors="ignore").decode("utf-8", errors="ignore").strip()
    return {
        "links": links,
        "base_href": p.base_href,
        "title": "".join(p.title_parts).strip(),
        "text": text,
    }


def extract_text_py(html) -> str:
    return parse_page(html)["text"]


def extract_links_py(html) -> list[str]:
    return parse_page(html)["links"]


# ---------------------------------------------------------------- UDFs

_LINKS_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("href", T.StringType()), T.StructField("pos", T.IntegerType())]
    )
)

_PARSED_TYPE = T.StructType(
    [
        T.StructField("links", _LINKS_TYPE),
        T.StructField("base_href", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


@pandas_udf(_PARSED_TYPE)
def parse_page_udf(html: pd.Series) -> pd.DataFrame:
    rows = []
    for h in html:
        r = parse_page(h)
        rows.append(
            {
                "links": [{"href": l, "pos": i} for i, l in enumerate(r["links"])],
                "base_href": r["base_href"],
                "title": r["title"],
                "text": r["text"],
            }
        )
    return pd.DataFrame(rows, columns=["links", "base_href", "title", "text"])


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_text_py(h) for h in html], dtype="object")


@pandas_udf(_LINKS_TYPE)
def extract_links_udf(html: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [{"href": l, "pos": i} for i, l in enumerate(extract_links_py(h))]
            for h in html
        ],
        dtype="object",
    )


def make_scoped_links_udf(within_tag: str):
    """select_links_by equivalent (page.rb:123-136): restrict link
    extraction to <a> elements inside a given enclosing tag, e.g. 'h4'
    for the reference's "//h4/a[@href]" example
    (examples/count_listings.rb:30-34)."""

    @pandas_udf(_LINKS_TYPE)
    def scoped(html: pd.Series) -> pd.Series:
        out = []
        for h in html:
            links = parse_page(h, within_tag=within_tag)["links"]
            out.append([{"href": l, "pos": i} for i, l in enumerate(links)])
        return pd.Series(out, dtype="object")

    return scoped


def with_parsed(df, html_col: str = "html"):
    """Attach parsed struct columns (links/base_href/title/text)."""
    return (
        df.withColumn("_parsed", parse_page_udf(F.col(html_col)))
        .withColumn("links", F.col("_parsed.links"))
        .withColumn("base_href", F.col("_parsed.base_href"))
        .withColumn("title", F.col("_parsed.title"))
        .withColumn("page_text", F.col("_parsed.text"))
        .drop("_parsed")
    )
