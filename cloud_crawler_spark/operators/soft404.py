"""Soft-404 detection: 200-coded pages whose body is an error page.

Large crawls hit hosts that answer every miss with HTTP 200 and a
human-readable "page not found" body (Bar-Yossef et al., "Sic Transit
Gloria Telae", WWW 2004). The reference trusts status codes alone
(page.rb:152-156 `success? = code 200..206`), so its store silently
fills with these husks; at a 10^10-URL frontier a single
misconfigured CDN can contribute millions. This operator supplies the
missing hygiene gate in two layers:

1. Per-page classifier (`soft404_flag`): the body contains a known
   error phrase AND is short (error pages are chrome + one sentence;
   the word-count gate keeps long articles that merely *mention*
   "not found"). Pure whole-stage-codegen boolean algebra — no UDF.
2. Per-host rollup (`host_soft404_rates`): fraction of 200-coded
   pages flagged per host. Hosts above a rate threshold are suspects
   whose 200s should be re-probed or discounted (the classic remedy:
   fetch a random non-existent URL and compare — the rate rollup is
   the batch-side evidence that triggers it).

Scale shape: the flag is a map-side projection; the rollup is one
groupBy(host) with count/sum aggregates — map-side combinable, no
joins, no skew beyond genuinely hot hosts. Feed `soft404_hosts` into
`CrawlConfig.skip_link_patterns` or per-host budgets the same way
`traps.trap_hosts` is consumed.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cloud_crawler_spark.functions.text import token_count

# Lowercased phrases that mark an error body. Deliberately short and
# public-knowledge; callers extend per deployment.
SOFT404_PHRASES = (
    "page not found",
    "404 error",
    "could not be found",
    "no longer available",
    "does not exist",
)

# Error pages are short; articles that merely cite "not found" are not.
DEFAULT_MAX_WORDS = 50


def soft404_flag(
    text_col: Column,
    code_col: Column | None = None,
    phrases: tuple[str, ...] = SOFT404_PHRASES,
    max_words: int = DEFAULT_MAX_WORDS,
) -> Column:
    """Boolean: body reads like an error page (phrase hit + short).

    When `code_col` is given, only 200-coded rows can flag (a real 404
    is a *hard* 404 — the status code already tells the truth there).
    """
    low = F.lower(text_col)
    hit = reduce(or_, (low.contains(p) for p in phrases), F.lit(False))
    flag = hit & (token_count(text_col) < max_words)
    if code_col is not None:
        flag = flag & (code_col == 200)
    return flag


def host_soft404_rates(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    code_col: str = "code",
    max_words: int = DEFAULT_MAX_WORDS,
) -> DataFrame:
    """(host, n_200, n_soft404, soft404_rate) — per-host evidence.

    Only 200-coded pages enter the denominator: hard 404s are honest
    and say nothing about whether the host lies on misses.
    """
    flag = soft404_flag(
        F.col(text_col), F.col(code_col), max_words=max_words
    )
    return (
        pages.where(F.col(code_col) == 200)
        .groupBy(host_col)
        .agg(
            F.count("*").cast("long").alias("n_200"),
            F.sum(flag.cast("long")).cast("long").alias("n_soft404"),
        )
        .withColumn(
            "soft404_rate", F.col("n_soft404") / F.col("n_200")
        )
    )


def soft404_hosts(
    pages: DataFrame,
    min_rate: float = 0.5,
    min_pages: int = 5,
    **kw,
) -> DataFrame:
    """Hosts whose 200s are mostly error bodies — re-probe or discount.

    `min_pages` keeps one unlucky page from condemning a small host.
    """
    return host_soft404_rates(pages, **kw).where(
        (F.col("soft404_rate") >= min_rate) & (F.col("n_200") >= min_pages)
    )
