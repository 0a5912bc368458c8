"""Crawler-trap detection: URL-template explosion per host.

Classic frontier pathology the reference has no defense for beyond
depth limits (dsl_core.rb:216-230 gates on depth/domain/patterns
only): calendar pages, session ids, faceted search and similar
generate unbounded URL spaces from a handful of path TEMPLATES. At a
10^10-URL frontier a single trap host can own the queue.

Detection is a pure codegen aggregation: collapse every path's digit
runs to one placeholder, count distinct URLs vs distinct templates per
host — a trap host has a huge URL count concentrated on few templates
(urls_per_template ≫ 1). Feed `trap_hosts` into
`CrawlConfig.skip_link_patterns` / per-host budgets to starve the
trap without blocklisting the host outright.

Everything is groupBy(host) over 2 distinct aggregates — map-side
combinable, no skew beyond a genuinely hot host (which is exactly the
row you want to see).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_template(urls: DataFrame, path_col: str = "path",
                  out_col: str = "template") -> DataFrame:
    """Digit-collapsed path template: every digit run -> 'N'
    (/cal/2013/04/17 -> /cal/N/N/N). Whole-stage-codegen regexp."""
    return urls.withColumn(
        out_col, F.regexp_replace(F.col(path_col), "[0-9]+", "N")
    )


def trap_scores(urls: DataFrame, host_col: str = "host",
                path_col: str = "path") -> DataFrame:
    """(host, n_urls, n_templates, urls_per_template): URL-space size
    vs template-space size per host."""
    t = with_template(urls, path_col)
    return (
        t.groupBy(host_col)
        .agg(
            F.count_distinct(F.col(path_col)).cast("long").alias("n_urls"),
            F.count_distinct(F.col("template")).cast("long").alias("n_templates"),
        )
        .select(
            host_col,
            "n_urls",
            "n_templates",
            (F.col("n_urls") / F.col("n_templates")).alias("urls_per_template"),
        )
    )


def trap_hosts(urls: DataFrame, threshold: float = 100.0,
               host_col: str = "host", path_col: str = "path") -> DataFrame:
    """Hosts whose URL space explodes from few templates — candidates
    for per-host budget starvation or skip patterns."""
    return trap_scores(urls, host_col, path_col).where(
        F.col("urls_per_template") >= threshold
    )
