"""Approximate nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (bounded query set x full corpus —
a broadcast of the queries against a scan of the corpus, no shuffle of
the big side). Scale path: sign-LSH bucketing (deterministic pseudo-
random hyperplanes derived from index arithmetic — no RNG state, any
executor regenerates them) so candidate generation is an equi-join on
the bucket key; top-k per query via window rank within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.dedup import cosine


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is expected small (broadcast); the corpus streams.
    Returns (query_id, neighbor_id, cos_sim, knn_rank), self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("knn_rank", F.row_number().over(w)).where(
        F.col("knn_rank") <= k
    )


def _sign_lsh_bucket(vec_col, n_planes: int = 8):
    """Sign-LSH bucket id from deterministic pseudo-random hyperplanes.

    Plane p's weight for dimension j = ((1 + j) * (2 * p + 3) * 2654435761
    mod 1000003) / 1000003 - 0.5 — pure arithmetic on the element index,
    identical on every executor, no RNG state (Knuth multiplicative
    hashing)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        # dot product with plane p via aggregate over (value, index)
        zipped = F.zip_with(
            vec_col,
            F.sequence(F.lit(1), F.size(vec_col)),
            lambda x, j: x.cast("double")
            * (((j * F.lit(2 * p + 3) * F.lit(2654435761)) % F.lit(1000003)).cast("double")
               / F.lit(1000003.0) - F.lit(0.5)),
        )
        dot = F.aggregate(zipped, F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on bucket id), then exact cosine rank within.
    Recall < 1 by design; bench against brute_force_knn."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("cv"),
        _sign_lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qv"),
        _sign_lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("knn_rank", F.row_number().over(w)).where(
        F.col("knn_rank") <= k
    )
