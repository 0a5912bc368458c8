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


def sitemap_coverage(
    declared: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-host coverage audit of a crawl against the site's own
    sitemap: how much of what the site DECLARED did we fetch, and how
    much of what we fetched was undeclared? The two gap lists drive
    opposite actions — declared-but-missing URLs are seed candidates
    for the next round (the site says they exist); crawled-but-
    undeclared ones are discovery surplus (or trap suspects when the
    ratio explodes).

    Inputs: two one-column (or wider) frames of URLs; both sides are
    canonicalized here so raw sitemap <loc>s and crawled urls compare
    on the engine's key. Returns per host:
    (host, n_declared, n_crawled, n_both, n_missing, n_extra,
    coverage_ppm) with coverage_ppm = 1e6 * n_both / n_declared
    (BIGINT-exact; 0-declared hosts report 0).

    Scale shape: one full outer join on canon_url (both sides
    pre-deduped by a map-side-combinable distinct) + ONE groupBy
    (host); no window, no driver state. Host skew is the usual salted
    story — but the join key is the URL, already maximally fine."""
    from cloud_crawler_spark.functions.canon import with_canon

    d = (
        with_canon(declared.select(F.col(url_col).alias("url")), "url")
        .select("canon_url").where(F.col("canon_url").isNotNull())
        .distinct().withColumn("_d", F.lit(1))
    )
    c = (
        with_canon(crawled.select(F.col(url_col).alias("url")), "url")
        .select("canon_url").where(F.col("canon_url").isNotNull())
        .distinct().withColumn("_c", F.lit(1))
    )
    joined = d.join(c, "canon_url", "full_outer")
    host = F.regexp_extract("canon_url", r"^[a-z]+://([^/]+)", 1)
    agg = joined.groupBy(host.alias("host")).agg(
        F.sum(F.coalesce("_d", F.lit(0))).cast("long").alias("n_declared"),
        F.sum(F.coalesce("_c", F.lit(0))).cast("long").alias("n_crawled"),
        F.sum(F.when(F.col("_d").isNotNull() & F.col("_c").isNotNull(), 1)
              .otherwise(0)).cast("long").alias("n_both"),
    )
    return agg.select(
        "host", "n_declared", "n_crawled", "n_both",
        (F.col("n_declared") - F.col("n_both")).alias("n_missing"),
        (F.col("n_crawled") - F.col("n_both")).alias("n_extra"),
        F.when(F.col("n_declared") > 0,
               F.expr("1000000 * n_both div n_declared"))
        .otherwise(F.lit(0)).cast("long").alias("coverage_ppm"),
    )
