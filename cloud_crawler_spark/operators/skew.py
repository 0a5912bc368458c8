"""Key-skew diagnostics: the audit you run BEFORE picking a partition
strategy.

Every shuffle in this engine partitions on some key (host, band_key,
list_id, template, ...). One hot key — a crawl's mega-host, an LSH
bucket of boilerplate, the empty-template — serializes its whole
reducer while the rest of the cluster idles; the engine's answer is
salting (operators/politeness.py) or capping (dedup.py max_bucket),
but both need NUMBERS to be set well. This module produces them from
the data: the heaviest keys, their share of the table, and the salt
factor that levels each against a target bucket size.

All integer-exact arithmetic (shares in ppm via BIGINT div, salt via
ceil-division), so the DuckDB oracle reproduces every row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    target_per_bucket: int = 10_000,
) -> DataFrame:
    """Top-k heaviest keys with skew numbers:
    (key, cnt, share_ppm, skew_x, salt_buckets, n_total, n_distinct).

    share_ppm = the key's parts-per-million of all rows (BIGINT-exact);
    skew_x    = cnt / mean-rows-per-key, floored (how many average
                keys this one key weighs);
    salt_buckets = ceil(cnt / target_per_bucket) — the salt factor
                that levels this key to the target reducer size (1 =
                no salting needed).

    Scale shape: ONE map-side-combinable groupBy(key) builds the
    frequency table (rows = distinct keys, never data rows); the 1-row
    totals ride a broadcast crossJoin (the dangling-mass pattern); the
    top-k window runs over the frequency table only. Ties break by
    key ASC, so the output is deterministic and engine-portable.
    """
    freq = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt"))
    tot = freq.select(
        F.sum("cnt").alias("_n"), F.count("*").alias("_d"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    ranked = freq.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= k)
    # the single-partition window ranks the FREQUENCY table (one row
    # per distinct key), not the data; at 10^8 distinct keys swap in
    # rank.with_global_rank with the same (cnt desc, key) ordering
    out = ranked.crossJoin(F.broadcast(tot))
    return out.select(
        "key", "cnt",
        F.expr("1000000 * cnt div _n").alias("share_ppm"),
        F.expr("cnt * _d div _n").alias("skew_x"),
        F.ceil(F.col("cnt") / F.lit(int(target_per_bucket)))
        .cast("long").alias("salt_buckets"),
        F.col("_n").alias("n_total"),
        F.col("_d").alias("n_distinct"),
    )
