"""Key-skew audit: exact shares, salt recommendations, determinism."""

from pyspark.sql import functions as F

from cloud_crawler_spark.operators.skew import key_skew


def test_key_skew_numbers(spark):
    rows = [("hot",)] * 500 + [(f"c{i}",) for i in range(50) for _ in range(4)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew(df, "k", k=3, target_per_bucket=100).collect()
    assert [r.key for r in out][0] == "hot"
    hot = out[0]
    assert hot.cnt == 500 and hot.n_total == 700 and hot.n_distinct == 51
    assert hot.share_ppm == 1000000 * 500 // 700
    assert hot.skew_x == 500 * 51 // 700   # ~36 average keys' weight
    assert hot.salt_buckets == 5           # ceil(500/100)
    # cold keys: salt 1 (no salting), ties broken by key asc
    assert [r.key for r in out[1:]] == ["c0", "c1"]
    assert all(r.salt_buckets == 1 for r in out[1:])


def test_key_skew_deterministic_under_partitioning(spark):
    df = spark.range(2000).select((F.col("id") % 37).cast("string").alias("k"))
    a = key_skew(df, "k", k=5).collect()
    b = key_skew(df.repartition(13), "k", k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
