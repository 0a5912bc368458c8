"""Revisit scheduling: freshness-driven recrawl over fetch history.

The reference's recurring driver re-submits the whole crawl on a timer
(driver.rb:214-226 ``queue.recur``) — every URL, every period. At a
10^10-URL frontier a uniform recrawl is the single largest waste in the
system; the classic fix (Cho & Garcia-Molina, "Effective Page Refresh
Policies for Web Crawlers", TODS 2003) is to estimate each page's
change rate from its own fetch history and spend the recrawl budget on
the pages most likely stale. This module is that scheduler as pure
DataFrame ops:

* ``change_stats``  — per-URL change counts from (canon_url, fetch_ts,
  content_hash) history via a per-URL window lag (fine-grained keys:
  the window partitions by canon_url, so no global sort and no skew
  beyond a single URL's history length).
* ``revisit_priority`` — Laplace-smoothed change rate × normalized
  staleness age; every page's priority grows with age (smoothing keeps
  never-changed pages recrawlable), pages observed changing every
  fetch grow ~(n+1)/(n+2)× faster than pages never seen changing
  ~1/(n+2).
* ``due_for_revisit`` — budgeted top-k selection of the stalest URLs.
* ``page_validators`` — ETag / Last-Modified extraction from stored
  response headers, feeding the live fetcher's conditional GET
  (sources/http_fetch._fetch_one): revisits of unchanged pages cost a
  304 with no body transfer.

Everything is whole-stage-codegen except the one per-URL lag window;
the q_revisit_schedule oracle replays the arithmetic in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_stats(fetches: DataFrame) -> DataFrame:
    """Per-URL change statistics from fetch history.

    fetches: (canon_url, fetch_ts TIMESTAMP, content_hash STRING) — one
    row per historical fetch. Returns one row per canon_url:
    (canon_url, n_fetches, n_intervals, n_changes, first_ts, last_ts,
    span_sec).
    """
    w = Window.partitionBy("canon_url").orderBy("fetch_ts")
    h = fetches.withColumn("_prev", F.lag("content_hash").over(w))
    return h.groupBy("canon_url").agg(
        F.count("*").alias("n_fetches"),
        (F.count("*") - 1).cast("long").alias("n_intervals"),
        F.sum(
            F.when(
                F.col("_prev").isNotNull()
                & (F.col("_prev") != F.col("content_hash")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_changes"),
        F.min("fetch_ts").alias("first_ts"),
        F.max("fetch_ts").alias("last_ts"),
        (
            F.unix_timestamp(F.max("fetch_ts"))
            - F.unix_timestamp(F.min("fetch_ts"))
        ).cast("long").alias("span_sec"),
    )


def revisit_priority(fetches: DataFrame, now) -> DataFrame:
    """Attach a revisit priority to every URL with fetch history.

    priority = rate * staleness, where
      rate      = (n_changes + 1) / (n_intervals + 2)   (Laplace)
      staleness = age_sec / avg_interval_sec            (ages in units
                  of the URL's own observed fetch cadence)
    URLs with a single fetch (no intervals) use age alone with the
    maximally-uncertain rate 1/2. `now` is a timestamp literal/column.
    """
    s = change_stats(fetches)
    now_c = F.lit(now).cast("timestamp") if not hasattr(now, "_jc") else now
    age = (F.unix_timestamp(now_c) - F.unix_timestamp(F.col("last_ts"))).cast(
        "double"
    )
    rate = (F.col("n_changes") + F.lit(1.0)) / (F.col("n_intervals") + F.lit(2.0))
    staleness = F.when(
        (F.col("n_intervals") > 0) & (F.col("span_sec") > 0),
        age * F.col("n_intervals") / F.col("span_sec"),
    ).otherwise(age / F.lit(86400.0))  # cadence unknown: age in days
    return s.select(
        "canon_url",
        "n_fetches",
        "n_changes",
        "last_ts",
        rate.alias("change_rate"),
        (rate * staleness).alias("priority"),
    )


def due_for_revisit(priorities: DataFrame, budget: int) -> DataFrame:
    """Budgeted selection: the `budget` stalest URLs (priority desc,
    canon_url asc tie-break — deterministic). A global top-k: Spark
    executes ORDER BY+LIMIT as TakeOrderedAndProject (per-partition
    top-k then a k-row merge on the driver side of the exchange), so
    no full sort materializes even at frontier scale."""
    return (
        priorities.orderBy(F.col("priority").desc(), F.col("canon_url").asc())
        .limit(budget)
    )


def content_diff(prev: DataFrame, cur: DataFrame,
                 id_col: str = "canon_url",
                 hash_col: str = "content_hash") -> DataFrame:
    """Snapshot diff between two crawls of the same site: one row per
    URL in either snapshot with status
    'added' | 'removed' | 'changed' | 'unchanged'.

    Input: (canon_url, content_hash) per snapshot (hash the stored
    html/text with e.g. F.md5). ONE full-outer equi-join on the URL —
    both sides shuffle on the same key, no skew beyond one URL. The
    'changed' set is what feeds change_stats/revisit_priority history;
    'removed' feeds seen-set expiry (expire_seen) so dead URLs free
    their filter slots."""
    p = prev.select(F.col(id_col), F.col(hash_col).alias("_ph"))
    c = cur.select(F.col(id_col), F.col(hash_col).alias("_ch"))
    return p.join(c, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_ph").isNull(), F.lit("added"))
        .when(F.col("_ch").isNull(), F.lit("removed"))
        .when(F.col("_ph") != F.col("_ch"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def page_validators(pages: DataFrame, canon_col: str = "canon_url") -> DataFrame:
    """(canon_url, url, host, etag, last_modified) from stored pages —
    the columns sources/http_fetch._fetch_one turns into
    If-None-Match / If-Modified-Since conditional-GET headers. All
    JVM-side map lookups on the stored response headers."""
    etag = F.element_at(F.col("headers"), F.lit("etag"))
    lm = F.element_at(F.col("headers"), F.lit("last-modified"))
    return pages.select(
        F.col(canon_col),
        "url",
        "host",
        F.when(etag.isNotNull(), F.element_at(etag, 1)).alias("etag"),
        F.when(lm.isNotNull(), F.element_at(lm, 1)).alias("last_modified"),
    )
