"""RSS / Atom feed seed source.

The reference bootstraps from flat seed files
(bin/start_crawl.rb:34-44); alongside sitemaps (sources/sitemap.py)
the other real-world seed channel is a site's syndication feed. This
module adds RSS 2.0 and Atom extraction Spark-first:

- entry blocks (``<item>…</item>`` / ``<entry>…</entry>``) are matched
  with ONE ``regexp_extract_all`` + ``explode`` over the decoded body,
  then per-block fields (link, title, published) come from small
  ``regexp_extract`` calls on the block — alignment-safe by
  construction (a link and title are only ever paired within their own
  block), all whole-stage codegen, no XML library, no Python.
- RFC 5005 feed paging (``<link rel="next">``, also the namespaced
  ``<atom:link>`` form RSS uses) recurses level-synchronously against
  the prepared corpus exactly like ``sitemap_seeds``: bounded depth,
  cycle-proof accumulated anti-join, ``localCheckpoint`` per level.

Entity handling matches sitemap.py: the five XML built-ins are
unescaped JVM-side, ``&amp;`` last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_crawler_spark.functions.canon import with_canon
from cloud_crawler_spark.sources.corpus import Corpus

_ITEM_RE = r"(?s)<item[\s>].*?</item>"
_ENTRY_RE = r"(?s)<entry[\s>].*?</entry>"
_RSS_LINK_RE = r"(?s)<link>\s*(.*?)\s*</link>"
# Atom entry links in preference order (RFC 4287: no rel implies
# alternate): explicit rel="alternate" (either attribute order), a
# rel-less link, then any link as a last resort (an entry carrying
# only rel="self" still yields its one URL). Java-regex lookahead is
# fine here — only Spark runs these; the oracle plants its fields.
_ATOM_ALT_A = r'(?s)<link[^>]*rel="alternate"[^>]*href="([^"]*)"'
_ATOM_ALT_B = r'(?s)<link[^>]*href="([^"]*)"[^>]*rel="alternate"'
_ATOM_NOREL = r'(?s)<link(?![^>]*rel=")[^>]*href="([^"]*)"'
_ATOM_LINK_RE = r'(?s)<link[^>]*href="([^"]*)"'
_TITLE_RE = r"(?s)<title[^>]*>\s*(.*?)\s*</title>"
_RSS_DATE_RE = r"(?s)<pubDate>\s*(.*?)\s*</pubDate>"
_ATOM_DATE_RE = r"(?s)<updated>\s*(.*?)\s*</updated>"
# rel=next at feed level, both attribute orders, optional ns prefix
_NEXT_A = r'<(?:[A-Za-z]+:)?link[^>]*rel="next"[^>]*href="([^"]*)"'
_NEXT_B = r'<(?:[A-Za-z]+:)?link[^>]*href="([^"]*)"[^>]*rel="next"'


def _unescape_xml(col):
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def extract_feed_entries(pages: DataFrame, url_col: str = "url",
                         body_col: str = "html") -> DataFrame:
    """Feed pages -> one row per entry:
    ``(feed_url, kind, link, title, published, next_url)``.

    kind is 'atom' when the body carries a ``<feed`` root, else 'rss'.
    next_url (the same value on every entry row of a feed) is the
    RFC 5005 rel="next" page if present, else NULL. Entries without a
    link are dropped (a seed source has nothing to do with them);
    title/published stay NULL when absent. Binary bodies are UTF-8
    decoded by the cast."""
    body = F.col(body_col).cast("string")
    is_atom = F.instr(body, "<feed") > 0
    block_re = F.when(is_atom, F.lit(_ENTRY_RE)).otherwise(F.lit(_ITEM_RE))
    link_re = F.when(is_atom, F.lit(_ATOM_LINK_RE)).otherwise(
        F.lit(_RSS_LINK_RE))
    alt_a = F.when(is_atom, F.lit(_ATOM_ALT_A)).otherwise(F.lit(_RSS_LINK_RE))
    alt_b = F.when(is_atom, F.lit(_ATOM_ALT_B)).otherwise(F.lit(_RSS_LINK_RE))
    norel = F.when(is_atom, F.lit(_ATOM_NOREL)).otherwise(F.lit(_RSS_LINK_RE))
    date_re = F.when(is_atom, F.lit(_ATOM_DATE_RE)).otherwise(
        F.lit(_RSS_DATE_RE))
    nxt = F.coalesce(
        F.nullif(F.regexp_extract(body, _NEXT_A, 1), F.lit("")),
        F.nullif(F.regexp_extract(body, _NEXT_B, 1), F.lit("")),
    )
    blocks = pages.select(
        F.col(url_col).alias("feed_url"),
        F.when(is_atom, F.lit("atom")).otherwise(F.lit("rss")).alias("kind"),
        nxt.alias("_next"),
        F.explode(F.regexp_extract_all(body, block_re, 0)).alias("_block"),
        link_re.alias("_link_re"),
        alt_a.alias("_alt_a"),
        alt_b.alias("_alt_b"),
        norel.alias("_norel"),
        date_re.alias("_date_re"),
    )
    b = F.col("_block")
    # the pattern operand is a per-row column (rss vs atom): the
    # python wrapper of regexp_extract insists on a str pattern, so
    # go through expr() — the SQL function accepts column patterns
    link = F.coalesce(
        F.nullif(F.expr("regexp_extract(_block, _alt_a, 1)"), F.lit("")),
        F.nullif(F.expr("regexp_extract(_block, _alt_b, 1)"), F.lit("")),
        F.nullif(F.expr("regexp_extract(_block, _norel, 1)"), F.lit("")),
        F.expr("regexp_extract(_block, _link_re, 1)"),
    )
    published = F.expr("regexp_extract(_block, _date_re, 1)")
    return (
        blocks.select(
            "feed_url", "kind",
            _unescape_xml(link).alias("link"),
            F.nullif(_unescape_xml(F.regexp_extract(b, _TITLE_RE, 1)),
                     F.lit("")).alias("title"),
            F.nullif(published, F.lit("")).alias("published"),
            _unescape_xml(F.col("_next")).alias("next_url"),
        )
        .where(F.col("link") != "")
    )


def feed_seeds(
    spark: SparkSession,
    corpus: Corpus,
    roots,
    max_pages: int = 5,
    priority: float = 1.0,
) -> DataFrame:
    """Expand feed roots (list of URLs or a DataFrame with ``url``)
    through rel="next" paging (≤ ``max_pages`` levels) into a
    ``seeds(url, priority)`` DataFrame ready for ``crawl()``.

    Unknown roots (not in the corpus) contribute nothing — the crawl's
    own fetch-join miss semantics. Live crawls compose like live
    robots: fetch the feed bodies into a pages-shaped frame,
    ``prepare_corpus`` it, call this."""
    if not isinstance(roots, DataFrame):
        roots = spark.createDataFrame([(u,) for u in roots], "url string")
    if max_pages <= 0:
        return spark.createDataFrame([], "url string, priority double")
    cur = with_canon(roots, "url").select("canon_url").distinct()
    visited = cur
    seed_parts: list[DataFrame] = []
    for _ in range(max_pages):
        matched = corpus.pages.join(cur, "canon_url").select("url", "html")
        entries = extract_feed_entries(matched).localCheckpoint(eager=True)
        seed_parts.append(entries.select("link").distinct())
        nxt = (
            with_canon(
                entries.where(F.col("next_url").isNotNull())
                .select(F.col("next_url").alias("url")).distinct()
            )
            .select("canon_url")
            .distinct()
            .join(visited, "canon_url", "left_anti")  # cycle-proof
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            cur = nxt
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        cur = nxt
    if not cur.isEmpty():
        import warnings

        warnings.warn(
            f"feed_seeds: rel=next paging not exhausted after "
            f"max_pages={max_pages} levels; seeds are incomplete",
            stacklevel=2,
        )
    seeds = seed_parts[0]
    for p in seed_parts[1:]:
        seeds = seeds.unionByName(p)
    return seeds.distinct().select(
        F.col("link").alias("url"), F.lit(priority).alias("priority")
    )


# ------------------------------------------------------ auto-discovery

# <link rel="alternate" type="application/rss+xml" href=...> in page
# heads — the standard discovery channel; attributes appear in any
# order, so probe type-then-href and href-then-type
_DISC_A = (r'(?s)<link[^>]*type="application/(rss|atom)\+xml"'
           r'[^>]*href="([^"]*)"')
_DISC_B = (r'(?s)<link[^>]*href="([^"]*)"[^>]*'
           r'type="application/(rss|atom)\+xml"')


def discover_feeds(pages: DataFrame, url_col: str = "url",
                   body_col: str = "html") -> DataFrame:
    """Feed auto-discovery over ordinary crawled pages: one row per
    advertised feed — (page_url, feed_url, feed_type rss|atom), the
    feed_url absolutized against the page (relative hrefs are the
    common case: ``href="/feed.xml"``).

    The crawl-composition: run this over each round's crawled pages,
    anti-join against feeds already known, and hand the fresh ones to
    feed_seeds — the crawler then tracks sites' syndication channels
    without any out-of-band feed list.

    Scale shape: two codegen regexp_extract_all passes + explode (no
    XML lib, no Python in the match); absolutization is the same
    Arrow-batched canon UDF every link in the engine goes through."""
    from cloud_crawler_spark.functions.canon import absolutize_udf

    body = F.col(body_col).cast("string")
    hits_a = F.arrays_zip(
        F.regexp_extract_all(body, F.lit(_DISC_A), 1).alias("kind"),
        F.regexp_extract_all(body, F.lit(_DISC_A), 2).alias("href"),
    )
    hits_b = F.arrays_zip(
        F.regexp_extract_all(body, F.lit(_DISC_B), 2).alias("kind"),
        F.regexp_extract_all(body, F.lit(_DISC_B), 1).alias("href"),
    )
    exploded = pages.select(
        F.col(url_col).alias("page_url"),
        F.explode(F.concat(hits_a, hits_b)).alias("h"),
    ).select(
        "page_url",
        F.col("h.kind").alias("feed_type"),
        _unescape_xml(F.col("h.href")).alias("_href"),
    ).where(F.col("_href") != "")
    return exploded.select(
        "page_url",
        absolutize_udf(F.col("_href"), F.col("page_url"),
                       F.lit(None).cast("string")).alias("feed_url"),
        "feed_type",
    ).distinct()
