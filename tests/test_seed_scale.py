"""seed_frontier at scale: a >SMALL_INPUT_ROWS seed list (the
sitemap/feed re-seeding shape, S13/G87/G89 -> crawl) must rank through
the range-partitioned prefix-sum path — no single-partition global
window — and produce output identical to the small-list window path."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators import rank as rank_ops
from cloud_crawler_spark.plans import crawler as crawler_mod
from cloud_crawler_spark.plans.crawler import seed_frontier

N = 25_000  # > rank_ops.SMALL_INPUT_ROWS (20k)


def _big_seeds(spark):
    # deterministic synthetic sitemap dump: 25k URLs over 50 hosts,
    # the last URL of every decade duplicating the decade's first URL
    # (first occurrence must win), in a known list order
    j = F.when(F.col("id") % 10 == 9, F.col("id") - 9).otherwise(F.col("id"))
    return (
        spark.range(N)
        .select(
            F.concat(
                F.lit("http://h"),
                (j % 50).cast("string"),
                F.lit(".ex.com/p"),
                j.cast("string"),
            ).alias("url")
        )
        .coalesce(4)
    )


def _collect_frontier(df):
    return sorted(
        (r["canon_url"], r["url"], r["host"], r["depth"], r["link_pos"])
        for r in df.collect()
    )


def test_big_seed_list_avoids_global_window(spark, monkeypatch):
    seeds = _big_seeds(spark)

    big = seed_frontier(spark, seeds)
    # the ranking job must not funnel the seed list through one
    # partition: the scalable path windows per physical partition only
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan

    # forcing the single-partition window path (raise the threshold)
    # must give byte-identical frontier rows
    monkeypatch.setattr(rank_ops, "SMALL_INPUT_ROWS", 10**9)
    monkeypatch.setattr(crawler_mod.rank_ops, "SMALL_INPUT_ROWS", 10**9)
    small = seed_frontier(spark, seeds)

    rows_big = _collect_frontier(big)
    rows_small = _collect_frontier(small)
    assert rows_big == rows_small
    # dedup kept first occurrence: every decade-closing url deduped away
    assert len(rows_big) == N - N // 10


def test_small_seed_list_unchanged(spark):
    seeds = spark.range(100).select(
        F.concat(F.lit("http://ex.com/p"), F.col("id").cast("string")).alias("url")
    ).coalesce(1)
    out = seed_frontier(spark, seeds)
    rows = out.orderBy("link_pos").collect()
    assert [r["link_pos"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["depth"] == 0 and r["status"] == "pending" for r in rows)
