"""Deterministic global rank: scalable path == single-window path,
stable across partitioning (the crawl-order contract's foundation)."""

from pyspark.sql import functions as F

from cloud_crawler_spark.operators.rank import with_global_rank


def test_rank_matches_sorted_order(spark):
    df = spark.range(1000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("tie")
    )
    ranked = with_global_rank(df, [F.col("k").asc(), F.col("tie").asc()], num_partitions=7)
    rows = sorted(ranked.collect(), key=lambda r: r["rank"])
    keys = [(r["k"], r["tie"]) for r in rows]
    assert keys == sorted(keys)
    assert [r["rank"] for r in rows] == list(range(1, 1001))


def test_rank_fast_path_equals_scalable_path(spark):
    df = spark.range(500).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("tie")
    )
    order = [F.col("k").desc(), F.col("tie").asc()]
    fast = {(r["k"], r["tie"]): r["rank"]
            for r in with_global_rank(df, order, known_count=500).collect()}
    scal = {(r["k"], r["tie"]): r["rank"]
            for r in with_global_rank(df, order, num_partitions=5).collect()}
    assert fast == scal


def test_rank_start_offset(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    ranked = with_global_rank(df, [F.col("k")], start=100, known_count=10)
    assert sorted(r["rank"] for r in ranked.collect()) == list(range(100, 110))


def test_rank_empty(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    assert with_global_rank(df, [F.col("k")]).count() == 0
