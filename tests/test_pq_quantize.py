"""Semantics tests for embedding compression: int8 scalar quantization
and product quantization (codebook training, arrow/sql encoder
agreement, ADC recall vs brute force). Oracle parity for the n_iters=0
SQL path lives in test_queries_oracle.py (q_embed_quantize, q_pq_knn).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def embeddings(spark):
    # 8-dim, 3 deterministic axis clusters with jitter
    rows = []
    for i in range(60):
        c = i % 3
        base = [0.0] * 8
        base[c] = 1.0
        jitter = [((i * 37 + j * 11) % 19 - 9) / 100.0 for j in range(8)]
        rows.append((i, [b + j for b, j in zip(base, jitter)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestQuantizeEmbeddings:
    def test_roundtrip_error_bounded(self, spark, embeddings):
        out = SIM.quantize_embeddings(embeddings).collect()
        assert len(out) == 60
        for r in out:
            # half-up int8: reconstruction error per component is at
            # most scale/2, so mse <= (scale/2)^2
            assert r["mse"] <= (r["scale"] / 2) ** 2 + 1e-9
            assert all(-127 <= q <= 127 for q in r["q8"])

    def test_hand_checked_vector(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.0, 0.25])], "vec_id long, embedding array<float>"
        )
        r = SIM.quantize_embeddings(df).collect()[0]
        s = 1.0 / 127
        assert r["scale"] == pytest.approx(s, abs=1e-6)
        # q = floor(x/s + .5): 127, floor(-63.5+.5)=-63, 0, floor(32.25)=32
        assert r["q8"] == [127, -63, 0, 32]

    def test_zero_vector_degenerate(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
        )
        r = SIM.quantize_embeddings(df).collect()[0]
        assert r["q8"] == [0, 0] and r["scale"] == 0.0 and r["mse"] == 0.0


class TestPQ:
    def test_codebook_shape_and_init(self, spark, embeddings):
        books = SIM.train_pq_codebooks(
            embeddings, n_subspaces=4, n_codes=8, n_iters=0, sample_mod=1
        )
        assert books.shape == (4, 8, 2)
        # init = sub-vectors of the 8 lowest-id rows
        first = embeddings.orderBy("vec_id").limit(1).collect()[0]["embedding"]
        np.testing.assert_allclose(
            books[0, 0], np.array(first[:2], dtype=np.float64), rtol=1e-6
        )

    def test_dim_not_divisible_raises(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="not divisible"):
            SIM.train_pq_codebooks(df, n_subspaces=2, n_codes=1)

    def test_arrow_and_sql_encoders_agree(self, spark, embeddings):
        books = SIM.train_pq_codebooks(
            embeddings, n_subspaces=4, n_codes=8, n_iters=1, sample_mod=1
        )
        a = {
            (r["vec_id"], r["m"]): r["code"]
            for r in SIM.pq_encode(embeddings, books, method="arrow").collect()
        }
        s = {
            (r["vec_id"], r["m"]): r["code"]
            for r in SIM.pq_encode(embeddings, books, method="sql").collect()
        }
        assert a == s and len(a) == 60 * 4

    def test_adc_recall_vs_brute(self, spark, embeddings):
        queries = embeddings.where(F.col("vec_id") < 6)
        exact = SIM.brute_force_knn(embeddings, queries, k=3)
        approx = SIM.pq_knn(
            embeddings, queries, k=3, n_subspaces=4, n_codes=16,
            n_iters=2, sample_mod=1,
        )
        ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        # cosine-top-3 vs L2-ADC-top-3 on clustered data: most overlap
        assert len(ex & ap) / len(ex) >= 0.5
        # ADC finds same-cluster neighbors: vec i's cluster is i % 3
        for q, n in ap:
            assert n % 3 == q % 3

    def test_adc_distance_is_codebook_distance_sum(self, spark, embeddings):
        # with n_codes == corpus size and n_iters=0, every vector is
        # its own centroid -> ADC == exact squared L2 between vectors
        small = embeddings.where(F.col("vec_id") < 8)
        out = SIM.pq_knn(
            small, small.where(F.col("vec_id") == 0), k=3,
            n_subspaces=4, n_codes=8, n_iters=0, sample_mod=1,
        ).collect()
        vecs = {
            r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in small.collect()
        }
        for r in out:
            want = float(((vecs[0] - vecs[r["neighbor_id"]]) ** 2).sum())
            assert r["adc_dist"] == pytest.approx(want, abs=1e-5)
