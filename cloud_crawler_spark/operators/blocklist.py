"""Domain-suffix blocklist gate (UT1/adult-blocklist-style filtering).

Crawl pipelines filter URLs against curated domain blocklists where a
blocked entry `example.com` must also block every subdomain
(`a.b.example.com`) but NOT lookalikes (`notexample.com`). The
reference's domain gate (`batch_crawl_job.rb` in_domain?) is exact
host equality; this operator is the suffix-matching generalization a
production corpus pipeline needs.

Plan shape for 100 TB: a host has a handful of labels, so each row
expands into <= ~5 label-suffix strings JVM-side (sequence+transform,
no UDF) and probes the blocklist with a BROADCAST left-semi join —
blocklists are small (UT1 adult list ~4M entries, a few hundred MB as
a broadcast hash map; for larger lists flip broadcast=False and the
probe becomes a shuffle equi-join on the suffix string). The corpus
side never shuffles in broadcast mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_suffixes(col):
    """All dot-suffixes of a hostname with >= 2 labels, plus the full
    host: 'a.b.example.com' -> ['a.b.example.com', 'b.example.com',
    'example.com'] (single-label suffixes like 'com' excluded so a TLD
    can never be blocklisted by accident)."""
    labels = F.split(col, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0))),
        lambda i: F.concat_ws(".", F.slice(labels, i + 1, n - i)),
    )


def apply_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    domain_col: str = "domain",
    broadcast: bool = True,
) -> DataFrame:
    """Annotate `df` with `blocked` (1 if host_col equals or is a
    subdomain of any blocklist domain). Survivors = blocked == 0."""
    probe = df.select(
        F.col(host_col).alias("_host_k"),
        F.explode(domain_suffixes(F.lower(F.col(host_col)))).alias("_sfx"),
    ).distinct()
    bl = blocklist.select(F.lower(F.col(domain_col)).alias("_sfx")).distinct()
    if broadcast:
        bl = F.broadcast(bl)
    hits = (
        probe.join(bl, "_sfx", "left_semi")
        .select("_host_k")
        .distinct()
        .withColumn("blocked", F.lit(1))
    )
    return (
        df.join(hits, F.col(host_col) == F.col("_host_k"), "left")
        .drop("_host_k")
        .withColumn("blocked", F.coalesce(F.col("blocked"), F.lit(0)))
    )
