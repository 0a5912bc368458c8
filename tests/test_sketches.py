"""Sketch operators: count-min, KMV, HyperLogLog.

Pins the structural guarantees a user relies on at scale:
CMS never under-counts (one-sided error) and its table is exactly
d*w rows; KMV is exact below k and within theory error above; HLL
registers merge by max (the property that makes per-partition
partial aggregation correct)."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.sketches import (
    cms_build, cms_estimate, cms_heavy_hitters, hll_distinct, kmv_distinct,
)


def _items(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "item string")


COUNTS = {f"w{i}": (1 + i % 7) for i in range(200)}
COUNTS["hot1"] = 500
COUNTS["hot2"] = 300


def test_cms_never_undercounts_and_bounded(spark):
    df = _items(spark, COUNTS)
    cms = cms_build(df, "item", d=4, w=512)
    assert cms.count() <= 4 * 512
    # total mass preserved per row of the sketch
    per_row = cms.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    n = sum(COUNTS.values())
    assert {r.s for r in per_row} == {n}
    est = {
        r.item: r.est
        for r in cms_estimate(cms, df.select("item").distinct(), "item",
                              d=4, w=512).collect()
    }
    assert set(est) == set(COUNTS)
    for k, true in COUNTS.items():
        assert est[k] >= true, k  # the CMS guarantee


def test_cms_heavy_hitters_no_miss(spark):
    df = _items(spark, COUNTS)
    hh = {r.item for r in
          cms_heavy_hitters(df, "item", threshold=300, d=4, w=512).collect()}
    # no true heavy hitter is missed; borderline extras allowed
    assert {"hot1", "hot2"} <= hh
    truth = {k for k, v in COUNTS.items() if v >= 300}
    assert truth <= hh


def test_cms_estimate_unknown_item_zero(spark):
    df = _items(spark, {"a": 3})
    cms = cms_build(df, "item", d=4, w=512)
    probe = spark.createDataFrame([("zzz-not-seen",)], "item string")
    [row] = cms_estimate(cms, probe, "item", d=4, w=512).collect()
    assert row.est == 0


def test_kmv_exact_below_k(spark):
    df = _items(spark, {f"u{i}": 2 for i in range(30)})  # dups collapse
    [row] = kmv_distinct(
        df.withColumn("g", F.lit("g")), "item", "g", k=64).collect()
    assert row.n_kept == 30 and row.est == 30.0


def test_kmv_estimates_above_k(spark):
    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("item"))
    [row] = kmv_distinct(df, "item", "g", k=256).collect()
    assert row.n_kept == 256
    # theory: relative error ~ 1/sqrt(k-2) ~ 6%; allow 4 sigma
    assert abs(row.est - 5000) / 5000 < 0.25


def test_hll_accuracy_and_small_range(spark):
    big = spark.range(20000).select(
        F.lit("big").alias("g"), F.col("id").cast("string").alias("item"))
    small = spark.range(40).select(
        F.lit("small").alias("g"), F.col("id").cast("string").alias("item"))
    out = {r.g: r for r in
           hll_distinct(big.union(small), "item", "g", p=8).collect()}
    # std error ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(out["big"].est - 20000) / 20000 < 0.26
    # linear-counting regime: tight
    assert abs(out["small"].est - 40) < 8


def test_hll_merge_by_max_register(spark):
    """Union-then-sketch equals sketching halves and taking the max
    register — the mergeability partial aggregation relies on."""
    a = spark.range(0, 3000)
    b = spark.range(1500, 6000)  # overlapping halves
    mk = lambda df: df.select(  # noqa: E731
        F.lit("g").alias("g"), F.col("id").cast("string").alias("item"))
    whole = hll_distinct(mk(a.union(b)), "item", "g", p=8).collect()[0]
    # merge = max over each register; equivalent to sketching the union
    merged = hll_distinct(mk(a).union(mk(b)), "item", "g", p=8).collect()[0]
    assert whole.est == pytest.approx(merged.est, rel=1e-12)
    assert whole.registers_hit == merged.registers_hit


def test_hll_rejects_non_nibble_p(spark):
    df = spark.createDataFrame([("g", "x")], "g string, item string")
    with pytest.raises(ValueError):
        hll_distinct(df, "item", "g", p=10)


# ---------------------------------------------------- diversity sample


def test_cluster_balanced_sample_properties(spark):
    from cloud_crawler_spark.operators.sampling import cluster_balanced_sample

    # 3 well-separated clusters of very different sizes; ids are
    # interleaved (3j + c) so the deterministic init (first n_lists
    # ids) lands one centroid in each true cluster
    rows = []
    centers = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0], 2: [0.0, 0.0, 10.0]}
    sizes = {0: 200, 1: 40, 2: 8}
    for c, n in sizes.items():
        for j in range(n):
            v = centers[c][:]
            v[(c + 1) % 3] += 0.01 * (j % 5)  # jitter, stays nearest c
            rows.append((3 * j + c, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = cluster_balanced_sample(
        emb, total_target=60, n_lists=3, n_iters=0, sample_mod=1)
    got = out.collect()
    assert len(got) <= 60
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.list_id, []).append(r.keep_rank)
    # keep_rank is a contiguous 1..q head per cluster
    for ranks in by_cluster.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # sqrt apportionment (weights isqrt: 14/6/2, tot 22): the
    # mega-cluster is capped well below its proportional share
    # (200/248 * 60 = 48) and the tail cluster is over-sampled
    lens = sorted((len(v) for v in by_cluster.values()), reverse=True)
    assert len(lens) == 3 and sum(lens) == 60
    assert lens[0] in (38, 39)   # 60*14//22 = 38 (+remainder)
    assert lens[2] in (5, 6)     # 60*2//22 = 5 (+remainder)

    # deterministic under different partitioning
    again = cluster_balanced_sample(
        emb.repartition(13), total_target=60, n_lists=3, n_iters=0,
        sample_mod=1)
    assert sorted((r.vec_id, r.list_id, r.keep_rank) for r in got) == \
        sorted((r.vec_id, r.list_id, r.keep_rank) for r in again.collect())


def test_cluster_balanced_small_cluster_keeps_all(spark):
    from cloud_crawler_spark.operators.sampling import cluster_balanced_sample

    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.9])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_balanced_sample(emb, total_target=100, n_lists=2,
                                  n_iters=0).collect()
    # target exceeds corpus: everything kept, nothing duplicated
    assert sorted(r.vec_id for r in out) == [0, 1, 2]


# ---------------------------------------------------- weighted sample


def test_weighted_sample_bias_and_determinism(spark):
    from cloud_crawler_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, F.lit(10)).otherwise(F.lit(1))
        .alias("w"),
    )
    got = weighted_sample(df, "w", k=200, id_col="doc_id").collect()
    assert len(got) == 200
    assert sorted(r.sample_rank for r in got) == list(range(1, 201))
    heavy = sum(1 for r in got if r.w == 10)
    # E[heavy] ~ 183 of 200 (10:1 odds, without replacement); the
    # draw is deterministic — this pins it stays weight-dominated
    assert heavy > 150
    again = weighted_sample(df.repartition(17), "w", k=200,
                            id_col="doc_id").collect()
    assert sorted((r.doc_id, r.sample_rank) for r in got) == \
        sorted((r.doc_id, r.sample_rank) for r in again)


def test_weighted_sample_excludes_nonpositive(spark):
    from cloud_crawler_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double")
    got = weighted_sample(df, "w", k=10, id_col="doc_id").collect()
    assert sorted(r.doc_id for r in got) == [1, 5]
