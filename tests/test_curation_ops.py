"""Semantics tests for the round-3 curation operators: benchmark
decontamination, span-level dedup, SemDeDup, and the domain blocklist.
The query/oracle parity lives in test_queries_oracle.py; these pin the
hand-checkable edge cases."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.blocklist import apply_blocklist, domain_suffixes
from cloud_crawler_spark.operators.dedup import decontaminate, span_dedup, token_ngrams
from cloud_crawler_spark.operators.similarity import semantic_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTokenNgrams:
    def test_basic_and_short_doc(self, spark):
        df = spark.createDataFrame(
            [("A b  c d",), ("x y",)], "t string"
        ).select(token_ngrams(F.col("t"), 3).alias("g"))
        got = [r["g"] for r in df.collect()]
        assert got[0] == ["a b c", "b c d"]
        assert got[1] == []  # shorter than n -> empty, never [1,0] sequence


class TestDecontaminate:
    def test_flags_shared_ngram_only(self, spark):
        train = _docs(spark, [
            (1, "alpha beta gamma delta epsilon"),   # shares 4-gram w/ bench
            (2, "one two three four five"),          # clean
            (3, "alpha beta gamma"),                 # too short for any 4-gram
        ])
        bench = _docs(spark, [(100, "zz alpha beta gamma delta yy")])
        got = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(train, bench, n=4).collect()
        }
        assert got == {1: 1, 2: 0, 3: 0}

    def test_all_rows_preserved(self, spark):
        train = _docs(spark, [(i, f"tok{i} a b c") for i in range(10)])
        bench = _docs(spark, [(99, "nothing shared here at all")])
        out = decontaminate(train, bench, n=4)
        assert out.count() == 10
        assert out.agg(F.sum("contaminated")).first()[0] == 0


class TestSpanDedup:
    def test_shared_span_dropped_order_kept(self, spark):
        # both docs OPEN with the same 10 tokens, so their first spans
        # are exact duplicates; the tails differ and must survive
        shared = " ".join(f"s{i}" for i in range(10))
        df = _docs(spark, [
            (1, f"{shared} tail1 x"),
            (2, f"{shared} tail2 y"),
            (3, "unique tokens entirely here"),
        ])
        got = {r["doc_id"]: r for r in span_dedup(df, window=10).collect()}
        assert got[1]["clean_text"] == "tail1 x"
        assert got[2]["clean_text"] == "tail2 y"
        assert got[1]["n_spans_dropped"] == 1 and got[1]["n_spans"] == 2
        assert got[3]["clean_text"] == "unique tokens entirely here"
        assert got[3]["n_spans_dropped"] == 0

    def test_all_spans_dropped_keeps_row(self, spark):
        t = " ".join(f"w{i}" for i in range(10))
        df = _docs(spark, [(1, t), (2, t)])
        got = {r["doc_id"]: r for r in span_dedup(df, window=10).collect()}
        assert got[1]["clean_text"] == "" and got[2]["clean_text"] == ""
        assert got[1]["n_spans_dropped"] == 1

    def test_empty_and_null_text_docs_keep_rows(self, spark):
        df = spark.createDataFrame(
            [(1, "some unique tokens here"), (2, ""), (3, None), (4, "   ")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in span_dedup(df, window=10).collect()}
        assert set(got) == {1, 2, 3, 4}  # one row per INPUT doc
        for d in (2, 3, 4):
            assert got[d]["clean_text"] == ""
            assert got[d]["n_spans"] == 0 and got[d]["n_spans_dropped"] == 0
        assert got[1]["clean_text"] == "some unique tokens here"


class TestSemanticDedup:
    def test_near_identical_in_cluster_dropped(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [1.0, 0.01, 0.0]),   # ~ vec 0 -> same cluster, cos ~1
            (3, [0.0, 0.0, 1.0]),
            (4, [0.0, 0.0, -1.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        # n_lists=2: centroids are vecs 0 and 1, so the near-identical
        # pair (0, 2) lands in the same cluster instead of vec 2
        # becoming its own centroid
        out = semantic_dedup(df, threshold=0.95, n_lists=2, n_iters=0)
        got = {r["vec_id"]: r["is_dup"] for r in out.collect()}
        assert got[2] == 1          # higher id of the near-identical pair
        assert got[0] == 0          # lower id survives
        assert got[1] == 0 and got[3] == 0 and got[4] == 0
        assert out.count() == 5     # every input vector gets a row


class TestBlocklist:
    def test_suffix_semantics(self, spark):
        hosts = spark.createDataFrame(
            [(1, "ads.example.com"),        # exact -> blocked
             (2, "a.b.ads.example.com"),    # subdomain -> blocked
             (3, "notads.example.com"),     # lookalike -> clean
             (4, "example.com"),            # parent of blocked -> clean
             (5, "Ads.Example.COM"),        # case-insensitive -> blocked
             (6, "com")],                   # bare TLD, single label -> clean
            "doc_id long, host string",
        )
        bl = spark.createDataFrame([("ads.example.com",)], "domain string")
        got = {r["doc_id"]: r["blocked"]
               for r in apply_blocklist(hosts, bl).collect()}
        assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 1, 6: 0}

    def test_tld_cannot_be_blocklisted(self, spark):
        df = spark.createDataFrame([("x.com",)], "host string").select(
            domain_suffixes(F.col("host")).alias("s")
        )
        assert df.first()["s"] == ["x.com"]  # 'com' alone never emitted


class TestLatestSnapshot:
    def test_newest_wins_with_tiebreak(self, spark):
        from datetime import datetime

        from cloud_crawler_spark.operators.dedup import latest_snapshot

        rows = [
            ("u1", datetime(2024, 1, 1), 1, "old"),
            ("u1", datetime(2024, 1, 3), 2, "new"),
            ("u1", datetime(2024, 1, 3), 3, "newest-tie"),  # ts tie -> id 3
            ("u2", datetime(2024, 1, 2), 4, "only"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, doc_id long, text string"
        )
        out = {r["url"]: r for r in latest_snapshot(df).collect()}
        assert len(out) == 2
        assert out["u1"]["text"] == "newest-tie" and out["u1"]["doc_id"] == 3
        assert out["u2"]["text"] == "only"


class TestMixtureRates:
    def _df(self, spark, per_lang):
        rows = []
        i = 0
        for lang, n in per_lang.items():
            for _ in range(n):
                rows.append((i, lang))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_integer_exact_rates(self, spark):
        from cloud_crawler_spark.operators.sampling import mixture_rates

        # en=100/de=50, target 80/20: N_out = min(125, 250) = 125,
        # k = (100, 25), rates = (1000, 500) permille
        df = self._df(spark, {"en": 100, "de": 50})
        out = {r["lang"]: r for r in
               mixture_rates(df, {"en": 800, "de": 200}).collect()}
        assert out["en"]["k_target"] == 100 and out["en"]["rate_permille"] == 1000
        assert out["de"]["k_target"] == 25 and out["de"]["rate_permille"] == 500

    def test_untargeted_stratum_dropped(self, spark):
        from cloud_crawler_spark.operators.sampling import (
            mixture_rates,
            rebalance_sample,
        )

        df = self._df(spark, {"en": 40, "de": 40, "zz": 40})
        rates = mixture_rates(df, {"en": 500, "de": 500})
        assert {r["lang"] for r in rates.collect()} == {"en", "de"}
        kept = rebalance_sample(df, {"en": 500, "de": 500})
        assert kept.where(F.col("lang") == "zz").count() == 0

    def test_rebalance_shares_near_target(self, spark):
        from cloud_crawler_spark.operators.sampling import rebalance_sample

        df = self._df(spark, {"en": 400, "de": 100})
        kept = rebalance_sample(df, {"en": 500, "de": 500}).groupBy("lang").count()
        got = {r["lang"]: r["count"] for r in kept.collect()}
        # target is 50/50 over the de-limited corpus (~100 each side);
        # hash sampling is binomial around the rate, allow slack
        assert abs(got["en"] - got["de"]) < 40
        assert got["de"] > 60  # de is the limiting stratum: rate 1000


class TestLatestSnapshotPayloadTypes:
    def test_map_payload_is_not_ordered(self, spark):
        # non-orderable payload (map) must ride the aggregation without
        # participating in the ordering (max_by, not max(struct))
        from datetime import datetime

        from cloud_crawler_spark.operators.dedup import latest_snapshot

        df = spark.createDataFrame(
            [
                ("u", datetime(2024, 1, 1), 1, {"h": "old"}),
                ("u", datetime(2024, 1, 2), 2, {"h": "new"}),
            ],
            "url string, warc_ts timestamp, doc_id long, headers map<string,string>",
        )
        out = latest_snapshot(df).collect()
        assert len(out) == 1 and out[0]["headers"] == {"h": "new"}


class TestMixtureAbsentStratum:
    def test_missing_targeted_stratum_collapses_mixture(self, spark):
        from cloud_crawler_spark.operators.sampling import mixture_rates

        df = spark.createDataFrame(
            [(i, "en") for i in range(10)], "doc_id long, lang string"
        )
        out = {r["lang"]: r for r in
               mixture_rates(df, {"en": 500, "zh": 500}).collect()}
        # zh absent -> N_out = 0 -> nothing survives, and the absent
        # stratum is REPORTED (n_docs 0), never silently renormalized
        assert out["zh"]["n_docs"] == 0 and out["zh"]["rate_permille"] == 0
        assert out["en"]["k_target"] == 0 and out["en"]["rate_permille"] == 0


class TestIntradocDedup:
    def test_first_occurrence_kept_in_order(self, spark):
        from cloud_crawler_spark.operators.dedup import intradoc_dedup

        # window=2 spans: [a b][c d][a b][e f] -> second "a b" dropped
        df = _docs(spark, [(0, "a b c d a b e f"), (1, None)])
        out = {r["doc_id"]: r for r in intradoc_dedup(df, window=2).collect()}
        assert out[0]["clean_text"] == "a b c d e f"
        assert out[0]["n_spans"] == 4 and out[0]["n_spans_dropped"] == 1
        # null text keeps its row with the empty contract
        assert out[1]["clean_text"] == "" and out[1]["n_spans"] == 0

    def test_cross_doc_repeats_untouched(self, spark):
        from cloud_crawler_spark.operators.dedup import intradoc_dedup

        # the SAME span in two different docs is NOT a within-doc dup
        df = _docs(spark, [(0, "x y"), (1, "x y")])
        out = intradoc_dedup(df, window=2).collect()
        assert all(r["n_spans_dropped"] == 0 for r in out)


class TestExactSubstrDedup:
    def test_unaligned_passage_dropped_first_occurrence_kept(self, spark):
        from cloud_crawler_spark.operators.dedup import exact_substr_dedup

        # the 5-token passage sits at offset 2 in doc 0 and offset 0 in
        # doc 1 — span_dedup's aligned chunks would MISS this; the
        # sliding window must keep doc 0 (global first occurrence,
        # min (doc_id, pos)) whole and cut tokens 0..4 from doc 1
        passage = "p0 p1 p2 p3 p4"
        df = _docs(spark, [
            (0, f"a b {passage} c"),
            (1, f"{passage} z w q"),
        ])
        out = {r["doc_id"]: r for r in exact_substr_dedup(df, window=4).collect()}
        assert out[0]["clean_text"] == "a b p0 p1 p2 p3 p4 c"
        assert out[0]["n_dropped"] == 0 and out[0]["n_tokens"] == 8
        assert out[1]["clean_text"] == "z w q"
        assert out[1]["n_dropped"] == 5 and out[1]["n_tokens"] == 8

    def test_same_doc_unaligned_repeat_dropped(self, spark):
        from cloud_crawler_spark.operators.dedup import exact_substr_dedup

        # [m n o p] recurs at offsets 0 and 5 of the SAME doc — the
        # second occurrence's tokens go, the first stays
        df = _docs(spark, [(0, "m n o p x m n o p")])
        out = exact_substr_dedup(df, window=4).collect()[0]
        assert out["clean_text"] == "m n o p x"
        assert out["n_tokens"] == 9 and out["n_dropped"] == 4

    def test_short_null_and_empty_docs_pass_through(self, spark):
        from cloud_crawler_spark.operators.dedup import exact_substr_dedup

        # docs shorter than the window have no windows: returned whole
        # (lowercased, whitespace-normalized); null/empty keep rows
        df = spark.createDataFrame(
            [(0, "Tiny DOC"), (1, "Tiny DOC"), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in exact_substr_dedup(df, window=4).collect()}
        assert set(out) == {0, 1, 2, 3}
        assert out[0]["clean_text"] == "tiny doc" == out[1]["clean_text"]
        assert out[0]["n_dropped"] == 0
        for d in (2, 3):
            assert out[d]["clean_text"] == "" and out[d]["n_tokens"] == 0


class TestDsirWeights:
    def test_target_like_docs_score_higher(self, spark):
        from cloud_crawler_spark.operators.sampling import dsir_weights

        # target: legal-ish boilerplate; raw holds two in-domain docs,
        # two off-domain docs — importance weights must rank the
        # in-domain pair strictly above the off-domain pair
        target = _docs(spark, [
            (100, "the party shall indemnify the other party"),
            (101, "this agreement shall govern the party obligations"),
        ])
        raw = _docs(spark, [
            (0, "the party shall indemnify promptly"),
            (1, "this agreement shall bind the party"),
            (2, "cheap pills buy now click here"),
            (3, "weather today sunny with light winds"),
        ])
        w = {r["doc_id"]: r["logw"]
             for r in dsir_weights(raw, target, n_buckets=64).collect()}
        assert min(w[0], w[1]) > max(w[2], w[3])

    def test_empty_and_null_docs_get_zero(self, spark):
        from cloud_crawler_spark.operators.sampling import dsir_weights

        target = _docs(spark, [(100, "alpha beta gamma")])
        raw = _docs(spark, [(0, "alpha beta"), (1, ""), (2, None)])
        out = {r["doc_id"]: r for r in
               dsir_weights(raw, target, n_buckets=64).collect()}
        assert set(out) == {0, 1, 2}  # one row per raw doc
        for d in (1, 2):
            assert out[d]["n_grams"] == 0 and out[d]["logw"] == 0.0
        assert out[0]["n_grams"] == 3  # 2 unigrams + 1 bigram


class TestLengthQuantiles:
    """operators/sampling.length_quantiles — exact type-1 quantiles
    from the integer histogram (no per-group sort)."""

    @staticmethod
    def _brute(vals, q):
        # value at order statistic ceil(q*n), 1-indexed ascending
        import math

        s = sorted(vals)
        return s[max(math.ceil(q * len(s)), 1) - 1]

    def test_matches_order_statistic_definition(self, spark):
        import random

        from cloud_crawler_spark.operators.sampling import length_quantiles

        rng = random.Random(7)
        rows = [("g%d" % (i % 3), rng.randint(0, 50)) for i in range(401)]
        df = spark.createDataFrame(rows, "lang string, n_chars long")
        got = {r.lang: r for r in length_quantiles(df).collect()}
        for g in ("g0", "g1", "g2"):
            vals = [v for k, v in rows if k == g]
            assert got[g].n_docs == len(vals)
            for q, col in ((0.25, "p25"), (0.5, "p50"),
                           (0.75, "p75"), (0.9, "p90")):
                assert got[g][col] == self._brute(vals, q), (g, q)

    def test_duplicates_and_singleton(self, spark):
        from cloud_crawler_spark.operators.sampling import length_quantiles

        df = spark.createDataFrame(
            [("a", 5)] * 10 + [("b", 9)], "lang string, n_chars long")
        got = {r.lang: r for r in length_quantiles(df).collect()}
        assert (got["a"].p25, got["a"].p90) == (5, 5)
        assert (got["b"].n_docs, got["b"].p50) == (1, 9)

    def test_corpus_reduced_before_window(self, spark):
        """The raw table must be reduced by the histogram groupBy
        BEFORE any window: the plan's Window operates on the
        aggregated stream, never directly over the scan."""
        from cloud_crawler_spark.operators.sampling import length_quantiles
        from pyspark.sql import functions as F

        df = spark.range(1000).select(
            (F.col("id") % 4).cast("string").alias("lang"),
            (F.col("id") % 37).alias("n_chars"))
        plan = length_quantiles(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Window" in plan and "HashAggregate" in plan
        # window input comes from the aggregate side, so the plan has
        # a partial+final agg pair under the window sort
        assert plan.index("Window") < plan.index("Range")
