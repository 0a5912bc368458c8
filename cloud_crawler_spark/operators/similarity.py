"""Approximate nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (bounded query set x full corpus —
a broadcast of the queries against a scan of the corpus, no shuffle of
the big side). Scale paths:

* sign-LSH bucketing (deterministic pseudo-random hyperplanes derived
  from index arithmetic — no RNG state, any executor regenerates them)
  so candidate generation is an equi-join on the bucket key;
* IVF (inverted-file) coarse quantization: k-means centroids trained
  on a corpus sample (Lloyd iterations as Spark aggregations), vectors
  assigned to their nearest list via an Arrow-batched numpy matmul
  UDF, queries probe their `n_probe` nearest lists — candidate
  generation again an equi-join on list_id, so the corpus never
  pairwise-joins itself. Top-k per query via window rank within
  candidates;
* product quantization (Jégou et al. 2011): the memory-bound path —
  the corpus is stored as m small codes per vector, queries broadcast
  m x k centroid distance tables, and ADC scoring is m table lookups
  via an equi-join on (m, code);
* int8 scalar quantization with per-vector scale: 4x memory off any
  of the above before a re-ranking pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


# ------------------------------------------------------------------ IVF


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def train_ivf_centroids(
    corpus: DataFrame,
    n_lists: int = 16,
    n_iters: int = 3,
    sample_mod: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train IVF coarse-quantizer centroids with Lloyd iterations.

    Training runs on a deterministic sample (`id % sample_mod == 0`) —
    at 100 TB the sample is what fits a few Spark aggregations, the
    full corpus is only ever touched by the single assignment pass.
    Init = the `n_lists` lowest-id sample vectors (deterministic).
    Centroid update is a groupBy over posexploded (list_id, dim, value)
    rows — sample-sized, so the dim-fanout shuffle is bounded.
    """
    sample = corpus.where(F.col(id_col) % sample_mod == 0).select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    init = sample.orderBy("_id").limit(n_lists).collect()
    cents = _normalize_rows(np.array([r["v"] for r in init], dtype=np.float64))

    for _ in range(n_iters):
        assign = _assign_list_udf(cents)
        assigned = sample.withColumn("list_id", assign(F.col("v")))
        new = (
            assigned.select("list_id", F.posexplode("v").alias("dim", "val"))
            .groupBy("list_id", "dim")
            .agg(F.avg("val").alias("c"))
            .collect()
        )
        nxt = cents.copy()
        for r in new:
            nxt[r["list_id"], r["dim"]] = r["c"]
        cents = _normalize_rows(nxt)
    return cents


def _assign_list_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    batch (cosine == dot product against normalized centroids)."""
    cT = centroids.T.copy()

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        m = _normalize_rows(np.array(vs.tolist(), dtype=np.float64))
        return pd.Series(np.argmax(m @ cT, axis=1).astype(np.int32))

    return assign


def _probe_lists_udf(centroids: np.ndarray, n_probe: int):
    @pandas_udf("array<int>")
    def probe(vs: pd.Series) -> pd.Series:
        m = _normalize_rows(np.array(vs.tolist(), dtype=np.float64))
        sims = m @ centroids.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return probe


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    n_iters: int = 3,
    sample_mod: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: equi-join on list_id between the
    list-assigned corpus and the n_probe-exploded queries, exact
    cosine + window rank within the candidate set.

    At scale the assigned corpus is written once, partitioned by
    list_id (partition pruning per query batch); recall is tuned by
    n_probe. Bench recall against brute_force_knn.
    """
    cents = train_ivf_centroids(
        corpus, n_lists=n_lists, n_iters=n_iters, sample_mod=sample_mod,
        vec_col=vec_col, id_col=id_col,
    )
    assign = _assign_list_udf(cents)
    probe = _probe_lists_udf(cents, n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("cv"),
    ).withColumn("list_id", assign(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qv"),
    ).withColumn("list_id", F.explode(probe(F.col("qv"))))

    scored = (
        c.join(q, "list_id")
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


def _sign_lsh_bucket(vec_col, n_planes: int = 8, plane_offset: int = 0):
    """Sign-LSH bucket id from deterministic pseudo-random hyperplanes.

    Plane p's weight for dimension j = ((1 + j) * (2 * p + 3) * 2654435761
    mod 1000003) / 1000003 - 0.5 — pure arithmetic on the element index,
    identical on every executor, no RNG state (Knuth multiplicative
    hashing). plane_offset selects a disjoint plane family per LSH
    table (banded multi-table probing, operators/dedup.py)."""
    bucket = F.lit(0)
    for p in range(plane_offset, plane_offset + n_planes):
        # dot product with plane p via aggregate over (value, index)
        zipped = F.zip_with(
            vec_col,
            F.sequence(F.lit(1), F.size(vec_col)),
            lambda x, j: x.cast("double")
            * (((j * F.lit(2 * p + 3) * F.lit(2654435761)) % F.lit(1000003)).cast("double")
               / F.lit(1000003.0) - F.lit(0.5)),
        )
        dot = F.aggregate(zipped, F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(
            dot > 0, F.lit(1 << (p - plane_offset))
        ).otherwise(F.lit(0))
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


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_lists: int = 16,
    n_iters: int = 0,
    sample_mod: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column
    (Abbas et al. 2023 semantics): cluster embeddings with the IVF
    coarse quantizer, then within each cluster drop any vector that has
    a LOWER-id neighbor with cosine >= threshold (deterministic
    keep-first rule; cosine rounded to 6 digits before the comparison
    so the decision is reproducible across engines).

    Plan shape for 100 TB: identical to IVF — centroids train on a
    deterministic sample, the corpus gets ONE Arrow-batched assignment
    pass, and candidate pairs come from a self equi-join on list_id
    (cluster size ~ N/n_lists; n_lists grows with N so per-cluster
    pair fanout stays bounded). No all-pairs join, no driver state
    beyond the n_lists x dim centroid matrix.

    Returns (id, list_id, is_dup) for every input vector — survivors
    are the is_dup = 0 rows.
    """
    cents = train_ivf_centroids(
        corpus, n_lists=n_lists, n_iters=n_iters, sample_mod=sample_mod,
        vec_col=vec_col, id_col=id_col,
    )
    assign = _assign_list_udf(cents)
    v = F.transform(vec_col, lambda x: x.cast("double"))
    # materialize: the self-join + the final annotate reference this
    # frame THREE times with different keys — without it the Arrow
    # assignment UDF (and the norm) runs once per reference; the row
    # norm is precomputed so each candidate pair evaluates only the
    # dot product. localCheckpoint (not .cache()) so the ContextCleaner
    # reclaims it once unreferenced.
    assigned = (
        corpus.select(F.col(id_col).alias("_id"), v.alias("_v"))
        .withColumn("list_id", assign(F.col("_v")))
        .withColumn(
            "_n",
            F.sqrt(F.aggregate(
                F.transform("_v", lambda x: x * x),
                F.lit(0.0), lambda acc, x: acc + x,
            )),
        )
        .localCheckpoint(eager=True)
    )
    a = assigned.select(F.col("_id").alias("_ida"), F.col("_v").alias("_va"),
                        F.col("_n").alias("_na"), "list_id")
    b = assigned.select(F.col("_id").alias("_idb"), F.col("_v").alias("_vb"),
                        F.col("_n").alias("_nb"), "list_id")
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    cos = F.when((F.col("_na") > 0) & (F.col("_nb") > 0),
                 dot / (F.col("_na") * F.col("_nb"))).otherwise(F.lit(0.0))
    dups = (
        a.join(b, "list_id")
        .where(F.col("_ida") < F.col("_idb"))
        .where(F.round(cos, 6) >= threshold)
        .select(F.col("_idb").alias("_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        assigned.join(dups, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "list_id",
            F.coalesce(F.col("is_dup"), F.lit(0)).alias("is_dup"),
        )
    )


def hashed_vectors(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    l2_normalize: bool = False,
) -> DataFrame:
    """Feature-hashing (hashing-trick) bag-of-words vectorizer
    (Weinberger et al., ICML 2009): every lowercase whitespace token
    lands in bucket md5[0:4] % dim with sign +/-1 from md5[4]'s
    parity; a document's vector is the signed count per bucket. This
    is the bridge from raw text to the ANN stack (brute/LSH/IVF kNN,
    SemDeDup) when no model embeddings exist — vocabulary-free, so no
    dictionary broadcast and no OOV, and the md5 arithmetic is the
    repo's engine-stable hash (hash_permille's — the DuckDB oracle
    reproduces every bucket and sign exactly; values are integer
    sums, so parity is bit-for-bit unless ``l2_normalize``).

    Output: (id_col, vec array<long> | array<double> when normalized,
    n_tokens). Empty/whitespace-only docs keep a row with the zero
    vector (explode_outer). Scale shape: explode -> groupBy(id, bkt)
    with map-side partial aggregation (at most `dim` rows per doc
    survive the shuffle regardless of document length) -> one
    groupBy(id) assembling the dense vector from a bucket->value map;
    no join, no UDF, no driver state.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    per = df.select(F.col(id_col), F.explode_outer(toks).alias("tok"))
    real = F.col("tok").isNotNull()
    bkt = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long") % dim
    )
    sgn = F.when(
        F.conv(F.substring(F.md5("tok"), 5, 1), 16, 10).cast("long") % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    g1 = per.groupBy(F.col(id_col), bkt.alias("bkt")).agg(
        F.sum(F.when(real, sgn).otherwise(0)).alias("v"),
        F.sum(F.when(real, 1).otherwise(0)).alias("c"),
    )
    g2 = g1.groupBy(id_col).agg(
        F.map_from_entries(
            F.filter(
                F.collect_list(
                    F.when(
                        F.col("bkt").isNotNull(),
                        F.struct(F.col("bkt"), F.col("v")),
                    )
                ),
                lambda e: e.isNotNull(),
            )
        ).alias("_m"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("long")),
            F.lit(0).cast("long"),
        ),
    )
    if l2_normalize:
        norm = F.sqrt(
            F.aggregate(
                vec, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")
            )
        )
        vec = F.transform(
            vec,
            lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0)),
        )
    return g2.select(F.col(id_col), vec.alias("vec"), "n_tokens")


# ----------------------------------------------------------------------
# Embedding compression: int8 scalar quantization + product quantization
# ----------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_levels: int = 127,
) -> DataFrame:
    """Symmetric int8 scalar quantization with a per-vector scale
    (scale = max|x| / 127; q = clamp(floor(x/scale + 0.5))) plus the
    reconstruction MSE — 4x memory off an ANN corpus before any
    re-ranking pass. floor(x + 0.5) instead of round() so both
    engines share one half-up rule (no banker's-rounding divergence).

    Scale shape: ONE codegen projection over array expressions
    (transform / zip_with / aggregate) — no UDF, no shuffle; the MSE
    fold is sequential in index order, matching the oracle's
    list_reduce. All-zero vectors quantize to zeros with scale 0.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(float(n_levels))
    q_raw = lambda x: F.greatest(  # noqa: E731
        F.lit(-n_levels),
        F.least(F.lit(n_levels), F.floor(x / scale + F.lit(0.5))),
    )
    qv = F.transform(
        v,
        lambda x: F.when(scale > 0, q_raw(x)).otherwise(F.lit(0)).cast("int"),
    )
    err = F.aggregate(
        F.zip_with(v, qv, lambda a, b: F.pow(a - b * scale, F.lit(2.0))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        qv.alias("q8"),
        F.round(scale, 6).alias("scale"),
        F.round(err / F.size(v), 6).alias("mse"),
    )


def train_pq_codebooks(
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    n_iters: int = 0,
    sample_mod: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., TPAMI 2011):
    split the vector into `n_subspaces` contiguous sub-vectors and
    k-means each subspace independently to `n_codes` centroids.

    Init = the sub-vectors of the `n_codes` lowest-id sample rows
    (deterministic, SQL-reproducible; the IVF convention). Lloyd
    updates run as Spark aggregations over the sample — assign codes
    with the Arrow UDF, posexplode (m, code, dim, value), one groupBy
    mean — so nothing corpus-sized ever reaches the driver.
    Returns shape (n_subspaces, n_codes, sub_dim), raw (unnormalized:
    PQ distances are L2, not cosine).
    """
    sample = corpus.where(F.col(id_col) % sample_mod == 0).select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    init = sample.orderBy("_id").limit(n_codes).collect()
    full = np.array([r["v"] for r in init], dtype=np.float64)
    dim = full.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={n_subspaces}")
    sub = dim // n_subspaces
    # (k, m*sub) -> (m, k, sub)
    books = full.reshape(n_codes, n_subspaces, sub).transpose(1, 0, 2).copy()

    for _ in range(n_iters):
        enc = _pq_codes_udf(books)
        assigned = sample.withColumn("codes", enc(F.col("v")))
        new = (
            assigned.select(
                F.posexplode("codes").alias("m", "code"), F.col("v")
            )
            .select(
                "m", "code",
                F.posexplode(
                    F.slice(F.col("v"), F.col("m") * sub + 1, sub)
                ).alias("d", "val"),
            )
            .groupBy("m", "code", "d")
            .agg(F.avg("val").alias("c"))
            .collect()
        )
        nxt = books.copy()
        for r in new:
            nxt[r["m"], r["code"], r["d"]] = r["c"]
        books = nxt
    return books


def _pq_codes_udf(codebooks: np.ndarray):
    """Arrow-batched PQ encoder: one vectorized (n, m, k) distance
    tensor per batch, argmin per subspace (ties -> lowest code, numpy
    argmin semantics)."""
    m, k, sub = codebooks.shape
    cb = codebooks.copy()

    @pandas_udf("array<int>")
    def codes(vs: pd.Series) -> pd.Series:
        a = np.array(vs.tolist(), dtype=np.float64).reshape(-1, m, sub)
        d = ((a[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(-1)
        return pd.Series(list(np.argmin(d, axis=2).astype(np.int32)))

    return codes


def _pq_codebook_df(spark, codebooks: np.ndarray) -> DataFrame:
    m, k, sub = codebooks.shape
    rows = [
        (mi, ki, [float(x) for x in codebooks[mi, ki]])
        for mi in range(m)
        for ki in range(k)
    ]
    return spark.createDataFrame(rows, "m int, code int, c array<double>")


def _subspace_l2(sub_col, cent_col):
    """Squared L2 between two equal-length arrays as a sequential
    index-order fold — bit-compatible with the oracle's list_reduce."""
    return F.aggregate(
        F.zip_with(sub_col, cent_col,
                   lambda a, b: F.pow(a - b, F.lit(2.0))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _explode_subspaces(df, id_alias: str, n_subspaces: int, sub: int,
                       vec_col: str, id_col: str) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
        lambda mi: F.struct(
            mi.cast("int").alias("m"),
            F.slice(v, mi * sub + 1, sub).alias("s"),
        ),
    )
    return df.select(
        F.col(id_col).alias(id_alias), F.explode(subs).alias("e")
    ).select(id_alias, F.col("e.m").alias("m"), F.col("e.s").alias("s"))


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    method: str = "sql",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector to its per-subspace nearest-centroid codes
    -> (id_col, m, code) rows. method='arrow' is the 100 TB path (one
    numpy tensor op per batch, output is n_subspaces ints per vector
    — a 32x compression of a float64 corpus at m=8). method='sql'
    ranks an exploded broadcast join against the codebook with the
    same sequential-fold arithmetic as the DuckDB oracle, so codes are
    exactly SQL-reproducible; a pytest pins arrow == sql on the test
    corpus."""
    m, k, sub = codebooks.shape
    if method == "arrow":
        enc = _pq_codes_udf(codebooks)
        return corpus.select(
            F.col(id_col),
            F.posexplode(
                enc(F.transform(vec_col, lambda x: x.cast("double")))
            ).alias("m", "code"),
        )
    cb = F.broadcast(_pq_codebook_df(corpus.sparkSession, codebooks))
    subs = _explode_subspaces(corpus, id_col, m, sub, vec_col, id_col)
    d = subs.join(cb, "m").select(
        id_col, "m", "code", _subspace_l2(F.col("s"), F.col("c")).alias("d")
    )
    w = Window.partitionBy(id_col, "m").orderBy(
        F.col("d").asc(), F.col("code").asc()
    )
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "m", "code")
    )


def pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
    n_iters: int = 0,
    sample_mod: int = 1,
    method: str = "sql",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) approximate top-k: the corpus is
    stored only as per-subspace codes; each query builds its m x k
    centroid distance table, and a candidate's approximate distance
    is the sum of m table lookups — never a full-dimension pass over
    corpus vectors.

    Scale shape: codes are the compressed corpus (n_subspaces small
    ints per vector); the per-query distance tables (|Q| * m * k rows)
    broadcast; the lookup is an equi-join on (m, code); the per-pair
    sum folds the m addends in subspace order (sort_array over (m, d)
    structs), bit-compatible with the oracle's list(d ORDER BY m) +
    list_reduce. For huge query batches swap the broadcast join for
    the Arrow table-lookup UDF; ranking stays identical.
    """
    books = train_pq_codebooks(
        corpus, n_subspaces=n_subspaces, n_codes=n_codes, n_iters=n_iters,
        sample_mod=sample_mod, vec_col=vec_col, id_col=id_col,
    )
    m, kk, sub = books.shape
    codes = pq_encode(corpus, books, method=method,
                      vec_col=vec_col, id_col=id_col).select(
        F.col(id_col).alias("neighbor_id"), "m", "code"
    )
    cb = F.broadcast(_pq_codebook_df(corpus.sparkSession, books))
    qsubs = _explode_subspaces(queries, "query_id", m, sub, vec_col, id_col)
    dtab = F.broadcast(
        qsubs.join(cb, "m").select(
            "query_id", "m", "code",
            _subspace_l2(F.col("s"), F.col("c")).alias("d"),
        )
    )
    paired = codes.join(dtab, ["m", "code"]).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    adc = (
        paired.groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("m", "d"))),
                F.lit(0.0),
                lambda acc, e: acc + e["d"],
            ).alias("_adc")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        adc.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("_adc", 6).alias("adc_dist"), "knn_rank",
        )
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """All-pairs sparse cosine similarity over TF-IDF vectors via an
    inverted-index self-join — the token-space twin of the embedding
    near-dup pass, for corpora with no model embeddings. The classic
    similarity-join scale trick (Bayardo, Ma & Srikant, WWW 2007
    "Scaling Up All Pairs Similarity Search"): candidate pairs only
    materialize where a SHARED term's posting list joins them, and
    terms with df > `max_df` are cut BEFORE the join — a stopword's
    posting list would fan out df^2 pairs while contributing almost
    nothing to any cosine (its idf ~ 0). The cosine is exact over the
    kept (df <= max_df) coordinates; idf weights are computed on the
    FULL corpus statistics before the cut.

    Returns (doc_a, doc_b, cos_sim) with doc_a < doc_b and
    cos_sim >= min_sim, rounded to 6 places (the embedding near-dup
    float discipline).

    Scale shape: postings and df are map-side-combinable groupBys;
    the df gate bounds every posting list, so the term self-join is
    bucket-quadratic with a hard cap (the LSH mega-bucket lesson);
    norms ride an equi-join on doc id. Prefix filtering would tighten
    the candidate set further at equal exactness — the df cut is its
    coarse, one-pass form.
    """
    from cloud_crawler_spark.operators.index import doc_freq, postings

    post = postings(docs, id_col, text_col)
    n = docs.agg(F.count("*").cast("double").alias("_n"))
    weighted = (
        post.join(doc_freq(post), "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col).alias("_id"),
            "term",
            "df",
            (F.col("tf") * F.log(F.col("_n") / F.col("df"))).alias("_w"),
        )
    )
    kept = weighted.where(F.col("df") <= max_df).localCheckpoint(eager=True)
    norms = kept.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_norm")
    )
    dots = (
        kept.alias("L")
        .join(kept.alias("R"), F.expr("L.term = R.term AND L._id < R._id"))
        .groupBy(
            F.expr("L._id").alias("doc_a"), F.expr("R._id").alias("doc_b")
        )
        .agg(F.sum(F.expr("L._w * R._w")).alias("_dot"))
    )
    na = norms.select(
        F.col("_id").alias("doc_a"), F.col("_norm").alias("_na")
    )
    nb = norms.select(
        F.col("_id").alias("doc_b"), F.col("_norm").alias("_nb")
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("_dot") / (F.col("_na") * F.col("_nb")), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min_sim)
    )


# ------------------------------------------------------- bitext mining


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tables: int = 0,
    planes_per_table: int = 6,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019; the
    CCMatrix/CCAligned alignment step): for every source document,
    elect the best target-language document by the ratio-margin score

        margin(x, y) = cos(x, y) / (0.5 * (avgNN_k(x) + avgNN_k(y)))

    where avgNN_k is the mean cosine of the k nearest candidates on
    the OTHER side — the normalization that suppresses hub vectors
    whose raw cosine is high against everything.

    Candidate generation: with ``n_tables == 0`` the exact path — the
    src side broadcasts against a streamed tgt scan (src is expected
    the bounded side; no shuffle of the big side). With
    ``n_tables > 0``, banded sign-LSH tables (deterministic
    index-arithmetic hyperplanes, see _sign_lsh_bucket) make candidate
    generation an equi-join on (table, bucket) — the 100 TB shape:
    neither side ever pairwise-joins itself, and the k-NN margin
    normalizers are computed over each side's candidate set, exactly
    as production miners use the ANN index's neighbors. Both paths
    finish with two map-side-combinable groupBys (the per-side top-k
    averages) and one window election per src.

    Returns (src_id, tgt_id, cos_sim, margin): the argmax-margin
    target per source, filtered to margin >= margin_threshold.
    """
    # norms are per-ROW quantities: compute them once per side (2
    # aggregates over n rows) instead of per candidate pair (which
    # cost 2 interpreted higher-order aggregates x |pairs| — measured
    # 4.5x the whole operator's runtime at 1M candidates)
    def _norm(vc):
        return F.sqrt(F.aggregate(
            F.transform(vc, lambda x: x * x), F.lit(0.0),
            lambda acc, v: acc + v))

    s = src.select(
        F.col(id_col).alias("src_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("sv"),
    ).withColumn("sn", _norm(F.col("sv")))
    t = tgt.select(
        F.col(id_col).alias("tgt_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("tv"),
    ).withColumn("tn", _norm(F.col("tv")))
    if n_tables > 0:
        def banded(df, idc, vc, nc):
            # the norm column rides along through the explode — one
            # projection, no re-derivation of the side and no extra
            # id equi-join per side
            tables = F.array(*[
                F.struct(
                    F.lit(i).alias("tbl"),
                    _sign_lsh_bucket(
                        F.col(vc), planes_per_table,
                        plane_offset=i * planes_per_table,
                    ).alias("bucket"),
                )
                for i in range(n_tables)
            ])
            return df.select(idc, vc, nc, F.explode(tables).alias("b")).select(
                idc, vc, nc, F.col("b.tbl").alias("tbl"),
                F.col("b.bucket").alias("bucket"),
            )
        sb = banded(s, "src_id", "sv", "sn")
        tb = banded(t, "tgt_id", "tv", "tn")
        # distinct on ids only (a pair can collide in several tables);
        # vectors ride along via min(struct) so no second fetch join
        cand = (
            sb.join(tb, ["tbl", "bucket"])
            .groupBy("src_id", "tgt_id")
            .agg(F.min(F.struct("sv", "sn", "tv", "tn")).alias("_v"))
            .select("src_id", "tgt_id", F.col("_v.sv").alias("sv"),
                    F.col("_v.sn").alias("sn"), F.col("_v.tv").alias("tv"),
                    F.col("_v.tn").alias("tn"))
        )
    else:
        cand = t.join(F.broadcast(s))
    dot = F.aggregate(
        F.zip_with(F.col("sv"), F.col("tv"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)
    scored = cand.select(
        "src_id", "tgt_id",
        F.round(
            F.when((F.col("sn") > 0) & (F.col("tn") > 0),
                   dot / (F.col("sn") * F.col("tn"))).otherwise(F.lit(0.0)),
            6,
        ).alias("cos_sim"),
    )
    # scored feeds THREE consumers (both top-k averages and the margin
    # join): materialize the slim (id, id, double) table once instead
    # of re-running the candidate join + dot per consumer
    scored = scored.localCheckpoint(eager=True)
    w_s = Window.partitionBy("src_id").orderBy(
        F.col("cos_sim").desc(), F.col("tgt_id").asc())
    w_t = Window.partitionBy("tgt_id").orderBy(
        F.col("cos_sim").desc(), F.col("src_id").asc())
    ranked = scored.withColumn("r_s", F.row_number().over(w_s)).withColumn(
        "r_t", F.row_number().over(w_t))
    s_avg = (ranked.where(F.col("r_s") <= k)
             .groupBy("src_id").agg(F.avg("cos_sim").alias("_sa")))
    t_avg = (ranked.where(F.col("r_t") <= k)
             .groupBy("tgt_id").agg(F.avg("cos_sim").alias("_ta")))
    margins = (
        scored.join(s_avg, "src_id").join(t_avg, "tgt_id")
        .select(
            "src_id", "tgt_id", "cos_sim",
            F.round(
                F.col("cos_sim")
                / (F.lit(0.5) * (F.col("_sa") + F.col("_ta"))), 6
            ).alias("margin"),
        )
    )
    w_best = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id").asc())
    return (
        margins.withColumn("_rk", F.row_number().over(w_best))
        .where((F.col("_rk") == 1)
               & (F.col("margin") >= F.lit(float(margin_threshold))))
        .drop("_rk")
    )
