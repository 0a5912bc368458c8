"""Main-content extraction (boilerplate removal) over stored HTML.

The engine's text column (P5) is the reference's full-page extracted
text (page.rb:206-208 parity — nav, footer and all). For LLM training
data the full page is the wrong unit: chrome repeats across millions
of pages and poisons dedup and quality signals. This module is the
classic block-segmentation + link-density heuristic (jusText /
Boilerpipe family, simplified and DETERMINISTIC):

* segment the DOM into text blocks at block-level tag boundaries
  (p, div, section, article, li, td, blockquote, pre, h1-h6, header,
  footer, nav, aside) — nested blocks are their own segments, text
  belongs to the nearest enclosing block;
* score each block by link density (anchor chars / total chars);
* keep blocks that are long enough and link-sparse; drop nav/aside/
  header/footer blocks outright (semantic chrome tags);
* main_text = kept blocks joined in document order.

Runs as one Arrow-batched pandas UDF over the html column — the same
hot-path shape as the parse stage. Oracle-checked end-to-end by
queries.q_main_content (synthetic chrome around known content: the
extracted main text must hash-match the content exactly).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

BLOCK_TAGS = frozenset(
    "p div section article li td blockquote pre h1 h2 h3 h4 h5 h6 "
    "header footer nav aside main table ul ol".split()
)
#: semantic chrome: dropped regardless of density/length
CHROME_TAGS = frozenset("header footer nav aside".split())
_SKIP = frozenset(("script", "style", "noscript", "template"))


class _BlockParser(HTMLParser):
    """Segment HTML into (tag, text, anchor_chars) blocks."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple] = []  # (tag, text, anchor_chars, order)
        self._frames: list[list] = []  # [tag, [text parts], anchor_chars, order]
        self._in_anchor = 0
        self._skip = 0
        self._order = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip += 1
            return
        if tag == "a":
            self._in_anchor += 1
        if tag in BLOCK_TAGS:
            self._order += 1
            self._frames.append([tag, [], 0, self._order])

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a":
            self._in_anchor = max(0, self._in_anchor - 1)
        if tag in BLOCK_TAGS:
            # close the nearest open frame of this tag (tolerates
            # misnesting the way the stdlib parser does)
            for i in range(len(self._frames) - 1, -1, -1):
                if self._frames[i][0] == tag:
                    t, parts, ach, order = self._frames.pop(i)
                    self.blocks.append((t, "".join(parts), ach, order))
                    break

    def handle_data(self, data):
        if self._skip or not self._frames:
            return
        f = self._frames[-1]
        f[1].append(data)
        if self._in_anchor:
            f[2] += len(data)

    def close(self):
        super().close()
        while self._frames:
            t, parts, ach, order = self._frames.pop()
            self.blocks.append((t, "".join(parts), ach, order))


def segment_blocks(html) -> list[tuple[str, str, float]]:
    """html -> [(tag, stripped_text, link_density)] in document order."""
    if html is None:
        return []
    s = html.decode("utf-8", errors="replace") if isinstance(
        html, (bytes, bytearray, memoryview)
    ) else str(html)
    p = _BlockParser()
    try:
        p.feed(s)
        p.close()
    except Exception:  # noqa: BLE001 — malformed html: keep what parsed
        pass
    out = []
    for tag, text, ach, order in sorted(p.blocks, key=lambda b: b[3]):
        t = text.strip()
        if not t:
            continue
        density = ach / len(text) if text else 0.0
        out.append((tag, t, density))
    return out


def extract_main_text_py(
    html,
    max_link_density: float = 0.4,
    min_chars: int = 10,
) -> str:
    """Kept blocks joined with newlines (document order)."""
    kept = [
        t
        for tag, t, d in segment_blocks(html)
        if tag not in CHROME_TAGS and d <= max_link_density and len(t) >= min_chars
    ]
    return "\n".join(kept)


def make_main_text_udf(max_link_density: float = 0.4, min_chars: int = 10):
    @pandas_udf(T.StringType())
    def _main_text(html: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_main_text_py(h, max_link_density, min_chars)
                for h in html
            ],
            dtype="object",
        )

    return _main_text


def with_main_text(df: DataFrame, html_col: str = "html",
                   out_col: str = "main_text",
                   max_link_density: float = 0.4,
                   min_chars: int = 10) -> DataFrame:
    """Attach the boilerplate-stripped main text column (one Arrow
    round trip per row batch, same envelope as the parse stage)."""
    udf = make_main_text_udf(max_link_density, min_chars)
    return df.withColumn(out_col, udf(F.col(html_col)))
