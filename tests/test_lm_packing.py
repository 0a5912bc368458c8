"""Unit invariants for the LM-scoring (operators/lm.py) and
sequence-packing (operators/packing.py) curation operators. The
cross-engine value parity is covered by test_queries_oracle
(q_lm_perplexity / q_vocab_coverage / q_seq_pack); these tests pin the
operator SEMANTICS on hand-built corpora where the right answer is
checkable by eye."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.lm import bigram_lm_score, vocab_coverage
from cloud_crawler_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- LM


def test_lm_in_distribution_beats_garbage(spark):
    # ids 0-3 train the model on "the cat sat" patterns; docs 4 and 9
    # (both id % 5 == 4 -> HELD OUT) are scored only: doc 4 is drawn
    # from the training distribution, doc 9 is token salad the model
    # never saw -> its perplexity must be strictly higher.
    rows = [(i, "the cat sat on the mat the cat sat") for i in range(4)]
    rows += [(4, "the cat sat on the mat"),
             (9, "zq xv qqq zq bbb xv zq qqq")]
    out = {r["doc_id"]: r for r in bigram_lm_score(_docs(spark, rows)).collect()}
    assert out[4]["ppl"] < out[9]["ppl"]
    assert out[4]["avg_logprob"] > out[9]["avg_logprob"]


def test_lm_short_doc_null_scores(spark):
    rows = [(0, "a b a b a"), (1, "onlyone"), (2, "  ")]
    out = {r["doc_id"]: r for r in bigram_lm_score(_docs(spark, rows)).collect()}
    assert len(out) == 3  # one row per INPUT doc
    for did in (1, 2):
        assert out[did]["n_bigrams"] == 0
        assert out[did]["avg_logprob"] is None and out[did]["ppl"] is None
    assert out[0]["n_bigrams"] == 4


def test_lm_train_split_excludes_heldout(spark):
    # doc 4 (4 % 5 == 4) is held out: a bigram appearing ONLY there is
    # unseen to the model, so a doc made of it scores like any other
    # unseen bigram -- same as a never-written one.
    rows = [(i, "a b a b") for i in range(4)] + [(4, "zz yy zz yy")]
    out = {r["doc_id"]: r for r in bigram_lm_score(_docs(spark, rows)).collect()}
    # held-out doc's own bigrams were not trained on: worse than train docs
    assert out[4]["ppl"] > out[0]["ppl"]


def test_vocab_coverage_oov_rate(spark):
    # vocab_size=2 -> vocab = {a, b} (freq desc, token asc tiebreak);
    # doc 1 has 2 OOV of 4 tokens.
    rows = [(0, "a a a b b"), (1, "a b zz yy")]
    out = {r["doc_id"]: r for r in
           vocab_coverage(_docs(spark, rows), vocab_size=2).collect()}
    assert out[0]["n_oov"] == 0 and out[0]["oov_rate"] == 0.0
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 2
    assert out[1]["oov_rate"] == pytest.approx(0.5)


def test_vocab_tiebreak_token_ascending(spark):
    # all tokens frequency 1 -> top-2 vocab is the lexicographically
    # first two; 'c' and 'd' are OOV.
    rows = [(0, "c a d b")]
    out = vocab_coverage(_docs(spark, rows), vocab_size=2).collect()[0]
    assert out["n_oov"] == 2


# ------------------------------------------------------------- packing


def _mkdocs(spark, ntoks):
    # doc i gets ntoks[i] one-char tokens; single bucket via id*16
    return _docs(spark, [(i * 16, "x " * n) for i, n in enumerate(ntoks)])


def test_pack_greedy_first_fit(spark):
    # seq_len=10, one bucket (ids all = 0 mod 16), sizes 4,4,4,9,2:
    # bin0=[4,4] (third 4 overflows), bin1=[4] (9 overflows),
    # bin2=[9] (2 overflows), bin3=[2].
    out = pack_sequences(_mkdocs(spark, [4, 4, 4, 9, 2]), seq_len=10).collect()
    rows = sorted(((r["doc_id"], r["bin_id"], r["tok_offset"]) for r in out))
    assert rows == [(0, 0, 0), (16, 0, 4), (32, 1, 0), (48, 2, 0), (64, 3, 0)]


def test_pack_invariants(spark):
    docs = _docs(
        spark, [(i, "t " * ((i * 7) % 90)) for i in range(200)]
    )
    packed = pack_sequences(docs, seq_len=64, n_buckets=16)
    rows = packed.collect()
    assert len(rows) == 200
    by_bucket = {}
    for r in rows:
        assert r["bucket"] == r["doc_id"] % 16
        assert r["truncated"] == (r["n_tokens"] > 64)
        if not r["truncated"]:
            assert r["tok_offset"] + r["n_tokens"] <= 64
        else:
            assert r["tok_offset"] == 0  # long docs open their own bin
        by_bucket.setdefault(r["bucket"], []).append(r)
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r["doc_id"])
        # bins are contiguous from 0 and never decrease in id order
        bins = [r["bin_id"] for r in rs]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        # within a bin, docs occupy disjoint in-order token ranges
        # (a truncated doc contributes only its kept seq_len prefix)
        for b1, b2 in zip(rs, rs[1:]):
            if b1["bin_id"] == b2["bin_id"]:
                assert b2["tok_offset"] == b1["tok_offset"] + min(
                    b1["n_tokens"], 64
                )


def test_packing_stats_fill_rate(spark):
    docs = _mkdocs(spark, [10, 10, 10])  # seq_len 10 -> 3 full bins
    stats = packing_stats(pack_sequences(docs, seq_len=10), seq_len=10).collect()
    assert len(stats) == 1
    assert stats[0]["n_docs"] == 3 and stats[0]["n_bins"] == 3
    assert stats[0]["fill_rate"] == pytest.approx(1.0)


def test_lm_empty_train_split_degrades_gracefully(spark):
    # every id % 5 == 4 -> empty train split: scores are the uniform
    # ln(1/1) = 0 smoother (ppl 1.0), never a division by zero
    rows = [(4, "a b c"), (9, "d e f")]
    out = bigram_lm_score(_docs(spark, rows)).collect()
    assert all(r["avg_logprob"] == 0.0 and r["ppl"] == 1.0 for r in out)


def test_pack_null_and_empty_text(spark):
    # NULL text must pack as a 0-token doc, not crash the pandas scan
    df = spark.createDataFrame(
        [(0, "a b c"), (16, None), (32, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, seq_len=10).collect()}
    assert len(out) == 3
    assert out[16]["n_tokens"] == 0 and out[32]["n_tokens"] == 0
    # zero-token docs fit wherever the cursor is, consuming nothing
    assert out[16]["bin_id"] == out[0]["bin_id"]


def test_vocab_coverage_keeps_empty_docs(spark):
    # same one-row-per-input-doc contract as bigram_lm_score
    rows = [(0, "a a b"), (1, "   "), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in vocab_coverage(df, vocab_size=1).collect()}
    assert len(out) == 3
    for did in (1, 2):
        assert out[did]["n_tokens"] == 0 and out[did]["n_oov"] == 0
        assert out[did]["oov_rate"] is None


class TestUnigramKL:
    """operators/lm.unigram_kl — corpus drift monitor."""

    def _kl(self, spark, ref_texts, cmp_texts, **kw):
        from cloud_crawler_spark.operators.lm import unigram_kl

        ref = spark.createDataFrame([(t,) for t in ref_texts], "text string")
        cmp_ = spark.createDataFrame([(t,) for t in cmp_texts], "text string")
        return {r.token: r for r in unigram_kl(ref, cmp_, **kw).collect()}

    def test_identical_corpora_zero_drift(self, spark):
        out = self._kl(spark, ["a b c", "a a"], ["a b c", "a a"])
        assert set(out) == {"a", "b", "c"}
        assert all(r.kl_term == 0.0 for r in out.values())

    def test_hand_computed_terms(self, spark):
        # ref: a a b (N=3)  cmp: a c (N=2)  V={a,b,c} alpha=1
        # p(a)=(2+1)/(3+3)=0.5     q(a)=(1+1)/(2+3)=0.4
        # p(b)=(1+1)/6=1/3         q(b)=(0+1)/5=0.2
        # p(c)=(0+1)/6=1/6         q(c)=(1+1)/5=0.4
        import math

        out = self._kl(spark, ["a a b"], ["a c"])
        assert (out["a"].c_ref, out["a"].c_cmp) == (2, 1)
        assert abs(out["a"].kl_term - round(0.5 * math.log(0.5 / 0.4), 8)) < 1e-12
        assert abs(out["b"].kl_term - round((1 / 3) * math.log((1 / 3) / 0.2), 8)) < 1e-12
        assert abs(out["c"].kl_term - round((1 / 6) * math.log((1 / 6) / 0.4), 8)) < 1e-12
        # Gibbs: total KL over the smoothed union-vocab distributions
        # is positive for differing corpora... NOTE the union-vocab
        # restriction keeps both distributions normalized over the same
        # support, so the inequality holds exactly
        assert sum(r.kl_term for r in out.values()) > 0

    def test_single_pass_single_shuffle_plan(self, spark):
        """One groupBy(token) + 1-row broadcast: the corpus must be
        shuffled exactly once (token agg) plus the scalar agg of the
        vocab-sized table — never joined row-to-row."""
        from cloud_crawler_spark.operators.lm import unigram_kl
        from pyspark.sql import functions as F

        df = spark.range(100).select(
            F.concat(F.lit("tok"), (F.col("id") % 9).cast("string")).alias("text"))
        plan = unigram_kl(df, df)._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "EvalPython" not in plan


class TestShardByBytes:
    def test_boundaries_and_totals(self, spark):
        from cloud_crawler_spark.operators.packing import shard_by_bytes

        # sizes 4,4,4,4 with target 8: shards split at prefix 0,4,8,12
        # -> shards 0,0,1,1
        rows = [(i, "x" * 4) for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r["shard"]
            for r in shard_by_bytes(df, 8, [F.col("doc_id")]).collect()
        }
        assert out == {0: 0, 1: 0, 2: 1, 3: 1}

    def test_oversized_row_owns_one_shard(self, spark):
        from cloud_crawler_spark.operators.packing import shard_by_bytes

        rows = [(0, "a" * 2), (1, "b" * 50), (2, "c" * 2)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r["shard"]
            for r in shard_by_bytes(df, 10, [F.col("doc_id")]).collect()
        }
        # prefix-before: 0, 2, 52 -> shards 0, 0, 5 (the giant row
        # spans past several boundaries but is ONE row in ONE shard)
        assert out == {0: 0, 1: 0, 2: 5}

    def test_matches_single_window_on_random_sizes(self, spark):
        import random

        from pyspark.sql import Window

        from cloud_crawler_spark.operators.packing import shard_by_bytes

        rnd = random.Random(3)
        rows = [(i, "x" * rnd.randrange(1, 40)) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["shard"]
            for r in shard_by_bytes(
                df, 256, [F.col("doc_id")], num_partitions=7
            ).collect()
        }
        w = (
            Window.orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        want = {
            r["doc_id"]: r["shard"]
            for r in df.select(
                "doc_id",
                F.floor(
                    F.coalesce(
                        F.sum(F.octet_length("text")).over(w), F.lit(0)
                    ) / 256
                ).alias("shard"),
            ).collect()
        }
        assert got == want

    def test_empty_and_validation(self, spark):
        import pytest as _pt

        from cloud_crawler_spark.operators.packing import shard_by_bytes

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert shard_by_bytes(empty, 8, [F.col("doc_id")]).count() == 0
        with _pt.raises(ValueError):
            shard_by_bytes(empty, 0, [F.col("doc_id")])
        with _pt.raises(ValueError):
            shard_by_bytes(empty, 8, [])
