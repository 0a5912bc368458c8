"""Corpus curation operators: deterministic sampling and quality
bucketing for training-data mixture construction.

A 100 TB corpus is never trained on whole: pipelines re-weight strata
(language, source domain) by *deterministic* hash sampling — so the
sample is reproducible across runs and machines, needs no shuffle, and
composes with any downstream filter — and bucket documents by a quality
signal into head/middle/tail tiers (CCNet, Wenzek et al. 2020 §4.4)
so mixtures can oversample the head.

Everything here is built-in pyspark.sql.functions (JVM, codegen):
sampling is a pure narrow filter (no shuffle at any scale); bucketing
is one window per stratum — the partition key is the stratum, so skew
is bounded by the largest language, and the sort is (int, id), not
floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cloud_crawler_spark.functions import text as TX


def hash_permille(col) -> Column:
    """Deterministic 0..999 bucket: first 4 hex digits of md5 of the
    column's string form, mod 1000. Stable across engines (the DuckDB
    oracle reproduces it with strpos arithmetic) and across runs —
    unlike ``df.sample()``, whose seed interacts with partitioning."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")
        % 1000
    )


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int = 1000,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: a row
    survives iff hash_permille(id) < the stratum's permille rate.
    rates_permille maps stratum value -> 0..1000; unlisted strata get
    default_permille (1000 = keep all). Narrow filter: no shuffle."""
    pm = hash_permille(F.col(id_col))
    thresh = None
    for k in sorted(rates_permille):
        cond = F.col(stratum_col) == k
        rate = F.lit(int(rates_permille[k]))
        thresh = F.when(cond, rate) if thresh is None else thresh.when(cond, rate)
    thresh = (
        F.lit(int(default_permille))
        if thresh is None
        else thresh.otherwise(F.lit(int(default_permille)))
    )
    return df.where(pm < thresh)


def quality_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style head/middle/tail tiers: within each language,
    rank documents by their own-language stopword-hit count (the
    fluency proxy standing in for CCNet's LM perplexity) and ntile
    into n_buckets; bucket 1 is the head. Ties break on id so the
    assignment is total and engine-independent. Languages without a
    stopword inventory score with the 'en' list (deterministic
    fallback).

    Scale shape: a naive ``ntile() OVER (PARTITION BY lang)`` funnels
    every document of a language through ONE reducer — dead at 100 TB.
    Instead the exact same assignment is computed with the prefix-sum
    decomposition (operators/rank.py pattern): (1) tiny per-(lang,
    score) histogram -> cumulative offsets + totals (a few-hundred-row
    window, broadcast back); (2) row_number within (lang, score) —
    thousands of fine partitions instead of one per language; (3)
    global rank = offset + local rank, bucket from the closed-form
    ntile formula. Output is bit-identical to the window version."""
    hits = {lang: TX.stopword_hits(F.col(text_col), lang) for lang in TX.STOPWORDS}
    expr = None
    for lang in sorted(TX.STOPWORDS):
        if lang == "en":
            continue
        cond = F.col(lang_col) == lang
        expr = F.when(cond, hits[lang]) if expr is None else expr.when(cond, hits[lang])
    n_stop = expr.otherwise(hits["en"])
    scored = df.select(
        F.col(id_col), F.col(lang_col), n_stop.cast("long").alias("n_stop")
    )

    # (1) per-(lang, score) histogram: tiny (|langs| x |score values|)
    hist = scored.groupBy(lang_col, "n_stop").agg(F.count(F.lit(1)).alias("_cnt"))
    w_cum = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("n_stop").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = hist.select(
        lang_col,
        "n_stop",
        F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy(lang_col)).alias("_total"),
    )

    # (2) local rank within the fine (lang, score) key
    w_loc = Window.partitionBy(lang_col, "n_stop").orderBy(F.col(id_col))
    ranked = (
        scored.withColumn("_loc", F.row_number().over(w_loc))
        .join(F.broadcast(offsets), [lang_col, "n_stop"])
    )

    # (3) closed-form ntile over global rank r in 1..total:
    # the first (total % n) buckets hold (total div n)+1 rows each
    r = F.col("_off") + F.col("_loc")
    base = F.floor(F.col("_total") / n_buckets)
    rem = F.col("_total") % n_buckets
    big = rem * (base + 1)  # rows covered by the size-(base+1) buckets
    bucket = F.when(r <= big, F.ceil(r / (base + 1))).otherwise(
        rem + F.ceil((r - big) / F.greatest(base, F.lit(1)))
    )
    return ranked.select(
        F.col(id_col),
        F.col(lang_col),
        F.col("n_stop"),
        bucket.cast("long").alias("bucket"),
    )


def mixture_rates(
    df: DataFrame,
    target_permille: dict[str, int],
    stratum_col: str = "lang",
) -> DataFrame:
    """Compute per-stratum keep rates that reshape the corpus into a
    target mixture (e.g. rebalance languages for training): the
    LARGEST corpus with the target shares that pure downsampling can
    produce. Corpus strata absent from target_permille are dropped;
    TARGETED strata absent from the corpus count as 0 docs, which
    (correctly) collapses the whole mixture to empty — a missing
    ingredient cannot be silently renormalized away.

    All arithmetic is integer (floor division), so the rates — and
    therefore every sampled row — are bit-identical across engines:
        N_out  = min over targeted strata of  n_s * 1000 // T_s
        k_s    = N_out * T_s // 1000
        rate_s = 1000 * k_s // n_s          (permille for hash_permille)

    Plan shape: the stratum filter pushes to the scan, one
    groupBy(stratum) count (map-side combinable) joins the tiny
    target-dict frame, the 1-row global min rides a broadcast
    crossJoin (no collect). Returns one row per targeted stratum:
    (stratum, n_docs, k_target, rate_permille).
    """
    if not target_permille:
        raise ValueError("target_permille must be non-empty")
    keys = [k for k in sorted(target_permille) if int(target_permille[k]) > 0]
    if not keys:
        raise ValueError("target_permille must have a positive entry")
    strata = df.sparkSession.createDataFrame(
        [(k, int(target_permille[k])) for k in keys],
        f"{stratum_col} string, _tp long",
    )
    present = (
        df.where(F.col(stratum_col).isin(keys))
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # both sides are <= |target| rows after the aggregation
    counts = strata.join(present, stratum_col, "left").select(
        F.col(stratum_col),
        F.coalesce("_n", F.lit(0)).cast("long").alias("n_docs"),
        "_tp",
    )
    # integral `div` (not floor(double-division)): a/b as doubles can
    # land at 499.999... for an exact 500 and floor() the wrong way —
    # `div` stays in 64-bit integers on both engines
    n_out = counts.agg(
        F.min(F.expr("(n_docs * 1000) div _tp")).alias("_nout")
    )  # 1 row
    return (
        counts.crossJoin(F.broadcast(n_out))
        .select(
            F.col(stratum_col),
            "n_docs",
            F.expr("(_nout * _tp) div 1000").cast("long").alias("k_target"),
        )
        .withColumn(
            "rate_permille",
            F.when(
                F.col("n_docs") > 0,
                F.expr("(1000 * k_target) div n_docs"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def rebalance_sample(
    df: DataFrame,
    target_permille: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply mixture_rates deterministically: keep a row iff
    hash_permille(id) < its stratum's rate. The |strata|-row rate
    table broadcasts back onto the corpus — the corpus side never
    shuffles, so this is a narrow filter at any scale (same property
    as stratified_sample, with the rates COMPUTED instead of given)."""
    rates = mixture_rates(df, target_permille, stratum_col=stratum_col)
    return (
        df.join(
            F.broadcast(rates.select(stratum_col, "rate_permille")),
            stratum_col,
        )
        .where(hash_permille(F.col(id_col)) < F.col("rate_permille"))
        .drop("rate_permille")
    )


def _hashed_gram_buckets(text_col: str, n_buckets: int) -> Column:
    """Per-row array of hashed {1,2}-gram feature buckets: lowercase
    whitespace tokens (same normalization as the dedup operators),
    unigrams + space-joined bigrams, each bucketed by the first 3 hex
    digits of md5 mod n_buckets — engine-stable (the DuckDB oracle
    reproduces it with strpos arithmetic, like hash_permille)."""
    from cloud_crawler_spark.operators.dedup import seq_tokens

    toks = seq_tokens(F.col(text_col))
    bis = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(toks, bis),
        lambda g: (
            F.conv(F.substring(F.md5(g), 1, 3), 16, 10).cast("long")
            % n_buckets
        ).cast("int"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit two bag-of-hashed-
    ngram multinomials — p over the small TARGET corpus (the domain you
    want more of), q over the RAW corpus — and score every raw doc with
    log w(d) = sum over d's grams of (ln p_bucket - ln q_bucket), both
    distributions add-alpha smoothed over the full bucket domain.
    High-weight docs look like the target; resampling by these weights
    is the paper's data-selection step (compose with the top-k /
    threshold machinery of the other sampling operators).

    Plan shape for 100 TB: both bucket-count aggregations are map-side
    combinable groupBys whose RESULT is n_buckets rows (the corpus
    shuffles ~one row per bucket per partition, never per gram); the
    log-ratio table (n_buckets rows) broadcast-joins onto the exploded
    raw grams, and the per-doc sum is one groupBy(id) with map-side
    partial aggregation — exploded gram rows carry only (id, int
    bucket) and combine back to ~one row per doc before shuffling. No
    driver state, no window functions, no Python in the row path.

    Returns one row per raw doc: (id, n_grams, logw) with logw rounded
    to 6 decimals (cross-engine float discipline); docs with no tokens
    get logw = 0.

    `raw` is scanned three times and `target` twice (two distribution
    fits + the scoring pass): feed source tables or materialized
    (cached/checkpointed) frames, not deep lazy pipelines — each scan
    re-nests the upstream plan. Both frames need `id_col` (it keys the
    small-input spreading repartition as well as the output).
    """
    b = int(n_buckets)
    gb = _hashed_gram_buckets(text_col, b)
    spark = raw.sparkSession

    # md5-per-gram is the dominant cost (~100 grams/doc); when the
    # input has fewer splits than cores (small files, single row
    # group) the three hashing passes run near-serially. One slim
    # (id, text) hash repartition costs far less than it unlocks; on
    # a real many-split corpus (the 100 TB case) this is a no-op.
    par = spark.sparkContext.defaultParallelism

    def _spread(df: DataFrame, cols) -> DataFrame:
        slim = df.select(*cols)
        if slim.rdd.getNumPartitions() < par:
            slim = slim.repartition(par, F.col(id_col))
        return slim

    raw = _spread(raw, [id_col, text_col])
    target = _spread(target, [id_col, text_col])
    dom = spark.range(b).select(F.col("id").cast("int").alias("bkt"))

    def _log_dist(df: DataFrame, out: str) -> DataFrame:
        cnt = (
            df.select(F.explode(gb).alias("bkt"))
            .groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # total gram count = sum of the 512 bucket counts — derived
        # from cnt instead of a second full gram-hashing pass over the
        # corpus (sum(size(grams)) would re-tokenize + re-md5 everything)
        tot = cnt.agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("_t"))
        return (
            dom.join(cnt, "bkt", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "bkt",
                F.log(
                    (F.coalesce("_c", F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("_t") + F.lit(float(alpha) * b))
                ).alias(out),
            )
        )

    ratio = (
        _log_dist(target, "_lp")
        .join(_log_dist(raw, "_lq"), "bkt")
        .select("bkt", (F.col("_lp") - F.col("_lq")).alias("_lr"))
    )
    # n_grams is recovered as count(bkt) AFTER the explode rather than
    # projecting size(<gram expr>) next to explode_outer(<gram expr>):
    # expressions projected alongside a Generate are re-evaluated per
    # EXPLODED row, turning the md5 gram hashing quadratic (measured
    # 49s -> 0.5s on the sf0.01 scoring pass). explode_outer still
    # emits one null-bucket row per empty doc, so those keep their row
    # with n_grams = 0.
    ex = raw.select(F.col(id_col), F.explode_outer(gb).alias("bkt"))
    return (
        ex.join(F.broadcast(ratio), "bkt", "left")
        .groupBy(id_col)
        .agg(
            F.count("bkt").cast("long").alias("n_grams"),
            F.coalesce(F.round(F.sum("_lr"), 6), F.lit(0.0)).alias("logw"),
        )
    )


def length_quantiles(
    df: DataFrame,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    value_col: str = "n_chars",
    group_col: str = "lang",
) -> DataFrame:
    """EXACT per-group discrete quantiles (type-1: the value at order
    statistic ceil(q*n)) of an integer-valued column — the corpus
    length-profile health check (per-language length deciles drive
    min/max-length gate tuning and spot truncation regressions).

    Scale shape: `percentile() OVER (PARTITION BY lang)` funnels each
    language through one reducer — dead at 100 TB. Exact quantiles of
    an INTEGER measure need only its histogram: one map-side-combinable
    groupBy(group, value) reduces the corpus to (groups x distinct
    values) rows; the cumulative window + quantile election then run on
    that histogram-sized table (same prefix-sum decomposition as
    quality_buckets / rank.py). Output: one row per group with n_docs
    and a p{q} column per requested quantile.
    """
    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        group_col,
        value_col,
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(Window.partitionBy(group_col)).alias("_total"),
    )
    aggs = [F.max("_total").cast("long").alias("n_docs")]
    for q in qs:
        target = F.ceil(F.lit(float(q)) * F.col("_total"))
        aggs.append(
            F.min(F.when(F.col("_cum") >= target, F.col(value_col)))
            .cast("long")
            .alias(f"p{int(round(q * 100))}")
        )
    return cum.groupBy(group_col).agg(*aggs)


def hash_split(
    df: DataFrame,
    weights_permille: dict[str, int],
    key_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment — the leakage-safe LM
    split: bucket = hash_permille(salt || key), carved into named
    splits by cumulative permille thresholds in SORTED split-name
    order (deterministic regardless of dict order). Pass the DEDUP
    CLUSTER id (dedup_clusters / canonical_aliases output) as
    `key_col`, not the doc id — near-duplicates then land on the SAME
    side of the split, which is the whole point (a val doc's twin in
    train is contamination the n-gram decontaminator only catches
    later and more expensively). The salt versions the split: new
    salt, new assignment, old one reproducible forever.

    weights_permille must sum to 1000 (e.g. {"train": 980, "val": 10,
    "test": 10}).

    Scale shape: ONE codegen projection (md5 + conv arithmetic + a
    CASE ladder), no shuffle, no UDF, no sampling seed that interacts
    with partitioning. Same md5 arithmetic as hash_permille, so the
    DuckDB oracle reproduces assignments bit-for-bit.
    """
    total = sum(weights_permille.values())
    if total != 1000:
        raise ValueError(f"weights_permille must sum to 1000, got {total}")
    pm = hash_permille(
        F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))
    )
    expr = None
    acc = 0
    names = sorted(weights_permille)
    for name in names[:-1]:
        acc += int(weights_permille[name])
        cond = pm < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def cluster_balanced_sample(
    emb: DataFrame,
    total_target: int,
    n_lists: int = 16,
    n_iters: int = 0,
    sample_mod: int = 1,
    weight: str = "sqrt",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cluster-balanced diversity sample over an embedding column:
    assign every vector to its nearest IVF centroid, apportion
    ``total_target`` across clusters by integer Hamilton quota
    (weight = isqrt(cluster size), the sqrt-proportional rule that
    over-samples small clusters relative to proportional), then keep
    each cluster's deterministically-ordered head. The
    cluster-then-cap shape of DataComp/SemDeDup-style curation: a
    proportional sample of a web corpus is dominated by its few
    mega-clusters (boilerplate shapes, templates); sqrt apportionment
    keeps the tail's semantic variety in the training mix.

    Returns (id_col, list_id int, keep_rank int) — kept rows only.
    A cluster smaller than its quota keeps all its rows (the sample
    may then be < total_target; quotas are NOT redistributed, so the
    output is a pure per-cluster function — stable when clusters are
    processed independently).

    Determinism/parity: centroids are the deterministic IVF init
    (n_iters=0 => first n_lists sampled vectors, normalized);
    within-cluster order is (md5(id), id) — engine-portable; quotas
    are exact BIGINT Hamilton (allocate_budget). The DuckDB oracle
    reproduces the whole pipeline bit-for-bit.

    Scale shape: assignment is one Arrow-batched matmul per batch
    against broadcast centroids; sizes/quotas are <= n_lists rows
    (broadcast back); the per-cluster window sorts only within a
    cluster — for mega-clusters swap in the salted two-stage top-k
    (operators/politeness.select_budget) since only the quota-sized
    head survives.
    """
    from cloud_crawler_spark.operators.politeness import allocate_budget
    from cloud_crawler_spark.operators.similarity import (
        _assign_list_udf, train_ivf_centroids,
    )

    cents = train_ivf_centroids(
        emb, n_lists=n_lists, n_iters=n_iters, sample_mod=sample_mod,
        vec_col=vec_col, id_col=id_col,
    )
    assign = _assign_list_udf(cents)
    assigned = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).withColumn("list_id", assign(F.col("_v"))).drop("_v")

    sizes = assigned.groupBy("list_id").agg(F.count("*").alias("_n"))
    wcol = (
        F.floor(F.sqrt(F.col("_n"))) if weight == "sqrt" else F.col("_n")
    ).cast("long").alias("weight")
    quota = allocate_budget(
        sizes.select("list_id", wcol), total_target,
        host_col="list_id", weight_col="weight",
    )

    win = Window.partitionBy("list_id").orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    ranked = assigned.withColumn("keep_rank", F.row_number().over(win))
    return (
        ranked.join(F.broadcast(quota), "list_id")
        .where(F.col("keep_rank") <= F.col("budget"))
        .select(id_col, F.col("list_id").cast("int").alias("list_id"),
                F.col("keep_rank").cast("int").alias("keep_rank"))
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006): each row draws u = md5-uniform(id) in (0, 1] and
    the k largest keys u^(1/w) win — inclusion probability
    proportional to weight, one pass, no rejection loop. The curation
    use: quality-weighted corpus subsets (weight = quality score or
    token count) that are reproducible across runs, partitionings and
    engines, unlike rand()-based sampling.

    Keys are compared in the log domain — ln(u)/w is a monotone twin
    of u^(1/w) (ln(u) < 0, divide by w > 0), avoiding pow's
    cross-engine rounding. Rows with weight <= 0 or NULL never win.

    Returns (id_col, weight_col, sample_rank long 1..k), best first.

    Scale shape: the key is a narrow projection (one md5 per row); the
    global top-k rides with_global_rank's range-partition prefix-sum
    (no single-partition window). At 10^10 rows, pre-filter with a
    per-partition top-k (each partition keeps k) before the global
    rank — mergeable exactly like any bottom-k sketch.
    """
    from cloud_crawler_spark.operators.rank import with_global_rank

    v = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12),
               16, 10).cast("double")
    u = (v + F.lit(1.0)) / F.lit(float(16 ** 12))
    w = F.col(weight_col).cast("double")
    keyed = df.select(
        F.col(id_col), F.col(weight_col),
        (F.log(u) / w).alias("_key"),
    ).where(w > 0)
    ranked = with_global_rank(
        keyed, [F.col("_key").desc(), F.col(id_col).asc()],
        rank_col="sample_rank",
    )
    return ranked.where(F.col("sample_rank") <= k).select(
        id_col, weight_col, "sample_rank"
    )
