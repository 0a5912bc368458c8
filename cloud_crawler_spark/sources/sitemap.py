"""Sitemap (sitemaps.org XML) seed source.

The reference bootstraps crawls from flat seed files
(bin/start_crawl.rb:34-44 loads a text file of URLs); real-world crawls
additionally bootstrap from each site's ``/sitemap.xml``. This module
adds that source Spark-first:

- ``extract_locs``: ``<loc>`` extraction is one ``regexp_extract_all``
  + ``explode`` over the decoded body — whole-stage codegen, no XML
  library, no Python. ``<sitemapindex>`` detection is a substring test.
- ``sitemap_seeds``: index recursion is a bounded level-synchronous
  iterative join against the prepared corpus (exactly the crawl's own
  BFS shape, plans/crawler.py): each level joins the current sitemap
  URL set to ``corpus.pages`` on canon_url, explodes the locs, routes
  child sitemaps to the next level (cycle-proof via an accumulated
  anti-join) and page URLs to the seed set. Sitemap bytes never pass
  through the driver; per-level ``localCheckpoint`` truncates the
  iterative plan like every other loop in the engine.

Live crawls compose the same way as live robots (operators/robots.py
``fetch_robots``): fetch ``/sitemap.xml`` bodies with the fetcher's
transport into a ``pages``-shaped DataFrame, ``prepare_corpus`` it, and
call ``sitemap_seeds`` on that.

Entity handling: sitemap XML escapes URLs (``&amp;`` etc.); the five
XML built-ins are unescaped JVM-side with a replace chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_crawler_spark.functions.canon import with_canon
from cloud_crawler_spark.sources.corpus import Corpus

# group 1 = the loc text; (?s) so a loc split across lines still matches
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"


def _unescape_xml(col):
    # &amp; must be LAST (an escaped &amp;lt; must not become '<')
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def extract_locs(pages: DataFrame, url_col: str = "url",
                 body_col: str = "html") -> DataFrame:
    """Sitemap pages -> one row per ``<loc>``:
    ``(sitemap_url, is_index, loc)``. ``is_index`` is true for
    ``<sitemapindex>`` documents (their locs are child sitemaps, not
    page URLs). Binary bodies are UTF-8 decoded by the cast."""
    body = F.col(body_col).cast("string")
    return (
        pages.select(
            F.col(url_col).alias("sitemap_url"),
            (F.instr(body, "<sitemapindex") > 0).alias("is_index"),
            F.explode(F.regexp_extract_all(body, F.lit(_LOC_RE), 1)).alias("_raw"),
        )
        .select("sitemap_url", "is_index",
                _unescape_xml(F.col("_raw")).alias("loc"))
        .where(F.col("loc") != "")
    )


def sitemap_seeds(
    spark: SparkSession,
    corpus: Corpus,
    roots,
    max_depth: int = 3,
    priority: float = 1.0,
) -> DataFrame:
    """Expand sitemap roots (list of URLs or a DataFrame with ``url``)
    through ``<sitemapindex>`` recursion (≤ ``max_depth`` levels) into a
    ``seeds(url, priority)`` DataFrame ready for ``crawl()``.

    Unknown roots (not in the corpus) contribute nothing — the same
    miss semantics as the crawl's own fetch join."""
    if not isinstance(roots, DataFrame):
        roots = spark.createDataFrame([(u,) for u in roots], "url string")
    if max_depth <= 0:
        return spark.createDataFrame([], "url string, priority double")
    cur = with_canon(roots, "url").select("canon_url").distinct()
    visited = cur
    seed_parts: list[DataFrame] = []
    for _ in range(max_depth):
        matched = corpus.pages.join(cur, "canon_url").select("url", "html")
        locs = extract_locs(matched).localCheckpoint(eager=True)
        seed_parts.append(
            locs.where(~F.col("is_index")).select("loc").distinct()
        )
        nxt = (
            with_canon(locs.where("is_index").select(F.col("loc").alias("url")))
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
        # depth exhausted with child sitemaps still pending — surface it
        # instead of silently under-seeding
        import warnings

        warnings.warn(
            f"sitemap_seeds: sitemapindex recursion not exhausted after "
            f"max_depth={max_depth} levels; seeds are incomplete",
            stacklevel=2,
        )
    seeds = seed_parts[0]
    for p in seed_parts[1:]:
        seeds = seeds.unionByName(p)
    return seeds.distinct().select(
        F.col("loc").alias("url"), F.lit(priority).alias("priority")
    )
