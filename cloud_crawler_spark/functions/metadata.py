"""Page-metadata extraction: <title>, meta description, OpenGraph
properties, rel=canonical — the header fields a corpus pipeline turns
into (title, description, body) training pairs and click-through
display data.

The reference stores whole pages and leaves header mining to user
blocks (its `doc[:title]` flows from Nokogiri in user code, e.g.
examples/count_listings.rb); here it is a first-class vectorized
extractor: one Arrow-batched pandas UDF producing a typed struct, so
the downstream selection/filtering stays codegen.

Kept separate from functions/parse.py on purpose: the crawl parser's
output is byte-pinned to reference goldens (P1/P5) and runs in the
crawl hot path; this extractor is a post-crawl analysis pass with its
own semantics (first occurrence wins, attribute entities unescaped by
html.parser, whitespace stripped)."""

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


class _MetaParser(HTMLParser):
    """First-occurrence collector for head metadata.

    Collects: <title> text, <meta name=description content>,
    <meta property=og:* content> (first value per property),
    <link rel=canonical href>. Parsing does not stop at </head> —
    real pages put og tags in <body> often enough that cutting early
    loses data."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self._in_title = False
        self._have_title = False
        self.description: str | None = None
        self.canonical: str | None = None
        self.og: dict[str, str] = {}

    def handle_starttag(self, tag, attrs):
        if tag == "title" and not self._have_title:
            self._in_title = True
        elif tag == "meta":
            d = dict(attrs)
            name = (d.get("name") or "").strip().lower()
            prop = (d.get("property") or "").strip().lower()
            content = d.get("content")
            if content is None:
                return
            if name == "description" and self.description is None:
                self.description = content
            elif prop.startswith("og:") and prop[3:] not in self.og:
                self.og[prop[3:]] = content
        elif tag == "link":
            d = dict(attrs)
            rel = (d.get("rel") or "").strip().lower()
            if rel == "canonical" and self.canonical is None:
                href = d.get("href")
                if href:
                    self.canonical = href

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title = False
            self._have_title = True

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)


METADATA_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("canonical", T.StringType()),
        T.StructField(
            "og", T.MapType(T.StringType(), T.StringType())
        ),
    ]
)


def _extract_one(html) -> dict:
    if html is None:
        s = ""
    elif isinstance(html, (bytes, bytearray)):
        s = bytes(html).decode("utf-8", errors="ignore")
    else:
        s = str(html)
    p = _MetaParser()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass
    title = "".join(p.title_parts).strip()
    return {
        "title": title if title else None,
        "description": p.description.strip() if p.description else None,
        "canonical": p.canonical.strip() if p.canonical else None,
        "og": {k: v.strip() for k, v in p.og.items()},
    }


@pandas_udf(METADATA_TYPE)
def metadata_udf(html: pd.Series) -> pd.DataFrame:
    rows = [_extract_one(h) for h in html]
    return pd.DataFrame(rows, columns=["title", "description",
                                       "canonical", "og"])


def with_metadata(df, html_col: str = "html",
                  out_col: str = "metadata"):
    """Append a `metadata` struct column (title, description,
    canonical, og map) extracted from `html_col`. One Arrow batch
    round-trip per partition; everything downstream of the struct is
    ordinary codegen column access."""
    return df.withColumn(out_col, metadata_udf(F.col(html_col)))
