"""Statistical language-model scoring and vocabulary induction for
corpus curation.

CCNet (Wenzek et al. 2020 §4.3) filters web text by the perplexity of
a language model trained on a trusted corpus; this module implements
that mechanism with an add-one-smoothed bigram LM trained and applied
entirely as DataFrame aggregations — upgrading the stopword "fluency
proxy" used by sampling.quality_buckets to the real thing. It also
builds a frequency-truncated vocabulary and reports per-document OOV
coverage — the standard pre-tokenizer health check before committing
to a tokenizer at training time.

Everything is built-in pyspark.sql.functions (JVM, codegen) — no UDFs:

* Training is two groupBys (unigram, bigram counts) over the train
  split. The shuffle key is the token / token-pair string; at 100 TB
  the model tables are vocabulary-sized (millions of rows, not
  corpus-sized), so the score-side joins are AQE-broadcastable in
  practice and correct shuffle equi-joins when not.
* The vocabulary size |V| (the smoothing denominator) is a 1-row
  aggregate carried via broadcast crossJoin — the same no-collect
  pattern as PageRank's dangling-mass term (operators/graph.py).
* Scoring explodes each document's adjacent token pairs and LEFT
  joins the model: unseen bigrams/unigrams coalesce to 0 and take the
  +1 / |V| smoothing mass. Per-doc mean log-prob and perplexity are
  one groupBy with map-side partial aggregation.

Reference anchor: the reference has no LM (2013-era crawler); this is
part of the training-data-pipeline surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.rank import with_global_rank


def _toks(col):
    """Lowercased whitespace tokens, empties removed — delegates to
    the canonical tokenizer (functions/text.py tokens) so a future
    tokenization change cannot silently diverge between modules."""
    from cloud_crawler_spark.functions.text import tokens

    return tokens(F.lower(col))


def _bigrams(tok_arr):
    """Array of (w1, w2) structs over adjacent tokens; empty when the
    document has fewer than two tokens (sequence() would descend on
    start > stop, so the short case is gated explicitly)."""
    n = F.size(tok_arr)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(tok_arr, i).alias("w1"),
            F.element_at(tok_arr, i + 1).alias("w2"),
        ),
    )
    return F.when(n >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_mod: int = 5,
    train_keep: int = 4,
) -> DataFrame:
    """Score every document with an add-one-smoothed bigram LM trained
    on the deterministic split ``id % train_mod < train_keep``.

    Per adjacent pair (w1, w2):
        logp = ln((c(w1,w2) + 1) / (c(w1) + |V|))
    with counts from the train split and |V| = distinct train unigrams.
    Returns one row per input doc:
        (id, n_bigrams, avg_logprob round 6, ppl = exp(-avg) round 4)
    Documents with fewer than two tokens keep a row with n_bigrams = 0
    and NULL scores.

    The deterministic modulo split (not df.randomSplit, whose output
    depends on partitioning) keeps the model — and therefore every
    score — reproducible across runs, engines, and cluster sizes.
    """
    toks = df.select(F.col(id_col), _toks(F.col(text_col)).alias("_t"))
    train = toks.where((F.col(id_col) % train_mod) < train_keep)

    uni = (
        train.select(F.explode("_t").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("_c1"))
    )
    bi = (
        train.select(F.explode(_bigrams(F.col("_t"))).alias("_b"))
        .select("_b.w1", "_b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("_c2"))
    )
    # greatest(|V|, 1): an empty train split must degrade to the
    # uniform ln(1/1)=0 smoother, not a division by zero
    vocab = uni.agg(
        F.greatest(F.count("*"), F.lit(1)).cast("double").alias("_vsz")
    )  # 1 row

    pairs = toks.select(
        F.col(id_col), F.explode(_bigrams(F.col("_t"))).alias("_b")
    ).select(F.col(id_col), "_b.w1", "_b.w2")
    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce("_c2", F.lit(0)) + 1)
                / (F.coalesce("_c1", F.lit(0)) + F.col("_vsz"))
            ).alias("_lp"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.avg("_lp").alias("_avg"))
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round("_avg", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("_avg")), 4).alias("ppl"),
        )
    )


def _trigrams(tok_arr):
    """Array of (w1, w2, w3) structs over adjacent token triples;
    empty below three tokens (same sequence() guard as _bigrams)."""
    n = F.size(tok_arr)
    tris = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.struct(
            F.element_at(tok_arr, i).alias("w1"),
            F.element_at(tok_arr, i + 1).alias("w2"),
            F.element_at(tok_arr, i + 2).alias("w3"),
        ),
    )
    return F.when(n >= 3, tris).otherwise(
        F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
    )


def stupid_backoff_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_mod: int = 5,
    train_keep: int = 4,
    alpha: float = 0.4,
) -> DataFrame:
    """Stupid-backoff trigram LM (Brants et al. 2007 §4 — the
    MapReduce web-scale LM: unnormalized relative frequencies with a
    constant backoff factor, no discounting pass), trained on the
    deterministic split ``id % train_mod < train_keep``:

        S(w3 | w1 w2) = c(w1w2w3) / c(w1w2)        if c(w1w2w3) > 0
                      = a * c(w2w3) / c(w2)        elif c(w2w3) > 0
                      = a^2 * max(c(w3), 0.5) / N  otherwise

    (the 0.5 floor keeps OOV words finite — the corpus-count score of
    Brants' S(w) = c(w)/N with an epsilon count for unseen w).

    Returns one row per input doc:
        (id, n_trigrams, avg_logscore round 6)
    Documents with fewer than three tokens keep a row with
    n_trigrams = 0 and a NULL score.

    Scale shape: the three count tables are map-side-combinable
    groupBys keyed by the grams; scoring is four equi-joins of the
    exploded corpus against them (partitioned by gram key — no
    broadcast assumption, the trigram table at web scale is itself
    huge) plus the 1-row token-total broadcast crossJoin. A hit in
    the trigram table guarantees its (w1,w2) context and a hit in the
    (w2,w3) table guarantees c(w2) > 0, so no division guards beyond
    the OOV floor are needed.
    """
    a = float(alpha)
    toks = df.select(F.col(id_col), _toks(F.col(text_col)).alias("_t"))
    train = toks.where((F.col(id_col) % train_mod) < train_keep)

    uni = (
        train.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("_cu"))
    )
    big = (
        train.select(F.explode(_bigrams(F.col("_t"))).alias("_b"))
        .select("_b.w1", "_b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("_cb"))
    )
    tri = (
        train.select(F.explode(_trigrams(F.col("_t"))).alias("_g"))
        .select("_g.w1", "_g.w2", "_g.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("_ct"))
    )
    total = uni.agg(
        F.greatest(F.sum("_cu"), F.lit(1)).cast("double").alias("_n")
    )  # 1 row

    pos = toks.select(
        F.col(id_col), F.explode(_trigrams(F.col("_t"))).alias("_g")
    ).select(F.col(id_col), "_g.w1", "_g.w2", "_g.w3")
    scored = (
        pos.join(tri, ["w1", "w2", "w3"], "left")
        .join(big.withColumnRenamed("_cb", "_c12"), ["w1", "w2"], "left")
        .join(
            big.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                F.col("_cb").alias("_c23"),
            ),
            ["w2", "w3"], "left",
        )
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("_cu").alias("_cu2")), ["w2"], "left")
        .join(uni.select(F.col("w").alias("w3"),
                         F.col("_cu").alias("_cu3")), ["w3"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.log(
                F.when(F.col("_ct").isNotNull(),
                       F.col("_ct") / F.col("_c12"))
                .when(F.col("_c23").isNotNull(),
                      F.lit(a) * F.col("_c23") / F.col("_cu2"))
                .otherwise(
                    F.lit(a * a)
                    * F.greatest(F.coalesce("_cu3", F.lit(0)).cast("double"),
                                 F.lit(0.5))
                    / F.col("_n"))
            ).alias("_lp"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_trigrams"), F.avg("_lp").alias("_avg"))
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_trigrams", F.lit(0)).cast("long")
            .alias("n_trigrams"),
            F.round("_avg", 6).alias("avg_logscore"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 200,
) -> DataFrame:
    """Induce the top-``vocab_size`` corpus vocabulary (by frequency,
    ties broken token-ascending so the cut is total and
    engine-independent) and report per-document OOV coverage:
        (id, n_tokens, n_oov, oov_rate round 6)
    — one row per INPUT doc (empty/null text: n_tokens 0, NULL rate),
    the same contract as bigram_lm_score.

    The global top-K rank runs on the AGGREGATED count table —
    vocabulary-sized, not corpus-sized — through the range-partition
    prefix-sum rank (operators/rank.py). The count table is cached and
    counted once so the rank's partition-size pass does not recompute
    the corpus-wide tokenize+count, and the exact count picks rank's
    small-input fast path when the vocabulary is tiny. The induced
    vocab (K rows) broadcasts back for the per-token membership probe.
    """
    toks = df.select(F.col(id_col), F.explode(_toks(F.col(text_col))).alias("_w"))
    counts = toks.groupBy("_w").agg(F.count("*").alias("_n")).cache()
    ranked = with_global_rank(
        counts,
        [F.col("_n").desc(), F.col("_w").asc()],
        rank_col="_r",
        known_count=counts.count(),
    )
    vocab = ranked.where(F.col("_r") <= vocab_size).select("_w")
    per_doc = (
        toks.join(F.broadcast(vocab.withColumn("_inv", F.lit(1))), "_w", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def unigram_kl(
    ref_df: DataFrame,
    cmp_df: DataFrame,
    text_col: str = "text",
    alpha: float = 1.0,
    round_digits: int = 8,
) -> DataFrame:
    """Per-token KL(P_ref || Q_cmp) contributions between two corpus
    snapshots' add-alpha-smoothed unigram distributions — the standard
    corpus drift monitor: run it dump-over-dump (or crawl-over-crawl)
    and alert when the divergence jumps (topic shift, spam flood,
    extraction regression upstream).

    Distributions live on the UNION vocabulary of the two sides with
    add-`alpha` smoothing: p(t) = (c_ref(t)+a) / (N_ref + a|V|), q(t)
    likewise; the output row per token carries both counts and
    kl_term = p * ln(p/q) (rounded so it is engine-reproducible —
    q_token_kl oracle). Total drift = SUM(kl_term) >= 0.

    Scale shape: ONE corpus-wide map-side-combinable groupBy(token)
    over the tagged union (conditional sums — the two sides never join
    row-to-row); the three normalizing scalars (N_ref, N_cmp, |V|) are
    a 1-row aggregate of the vocabulary-sized count table carried via
    broadcast crossJoin (the PageRank dangling-mass pattern). The
    per-token arithmetic is pure codegen — no UDF, no driver collect.
    """
    tagged = ref_df.select(
        F.explode(_toks(F.col(text_col))).alias("token"),
        F.lit(1).alias("is_ref"),
    ).unionByName(
        cmp_df.select(
            F.explode(_toks(F.col(text_col))).alias("token"),
            F.lit(0).alias("is_ref"),
        )
    )
    counts = tagged.groupBy("token").agg(
        F.sum(F.col("is_ref")).alias("c_ref"),
        F.sum(1 - F.col("is_ref")).alias("c_cmp"),
    )
    scalars = counts.agg(
        F.sum("c_ref").alias("_n_ref"),
        F.sum("c_cmp").alias("_n_cmp"),
        F.count("*").alias("_v"),
    )
    a = F.lit(float(alpha))
    p = (F.col("c_ref") + a) / (F.col("_n_ref") + a * F.col("_v"))
    q = (F.col("c_cmp") + a) / (F.col("_n_cmp") + a * F.col("_v"))
    return counts.crossJoin(F.broadcast(scalars)).select(
        "token",
        F.col("c_ref").cast("long").alias("c_ref"),
        F.col("c_cmp").cast("long").alias("c_cmp"),
        F.round(p * F.log(p / q), round_digits).alias("kl_term"),
    )
