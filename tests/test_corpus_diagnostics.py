"""Semantics tests for the corpus-diagnostics operators: Flesch
readability, trigram language ID, Zipf fit, top-k n-grams, and the
host-concentration scorecard. The query/oracle parity lives in
test_queries_oracle.py; these pin hand-checkable values and edge cases.
"""

import math

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.functions.text import (
    LANG_TRIGRAMS,
    host_concentration,
    lang_id_trigram,
    readability,
    top_ngrams,
    trigram_hits,
    zipf_fit,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestReadability:
    def test_known_sentence(self, spark):
        # "The cat sat on the mat." -> 6 words, 1 sentence, 6 syllables
        # (each word is one vowel run). Flesch = 206.835 - 1.015*6
        # - 84.6*1 = 116.145; FK = 0.39*6 + 11.8*1 - 15.59 = -1.45.
        df = _docs(spark, [(1, "The cat sat on the mat.")])
        row = readability(df).collect()[0]
        assert row["n_words"] == 6
        assert row["n_sentences"] == 1
        assert row["n_syllables"] == 6
        assert row["flesch_ease"] == pytest.approx(116.145, abs=1e-6)
        assert row["fk_grade"] == pytest.approx(-1.45, abs=1e-6)

    def test_punctuation_runs_collapse_to_one_sentence(self, spark):
        # "Wait... what?!" has two terminal runs ("..." and "?!").
        df = _docs(spark, [(1, "Wait... what?!")])
        assert readability(df).collect()[0]["n_sentences"] == 2

    def test_no_punctuation_floors_sentences_at_one(self, spark):
        df = _docs(spark, [(1, "no terminal punctuation here at all")])
        assert readability(df).collect()[0]["n_sentences"] == 1

    def test_empty_doc_survives(self, spark):
        row = readability(_docs(spark, [(1, "")])).collect()[0]
        assert row["n_words"] == 0 and row["n_syllables"] == 0
        # 0 words -> wps 0, spw 0: formula degenerates, never NaN/null
        assert row["flesch_ease"] == pytest.approx(206.835, abs=1e-6)


class TestLangIdTrigram:
    def test_identifies_each_language(self, spark):
        samples = {
            "en": "the king and the queen are singing of the nation",
            "de": "der lehrer und die schule sind nicht einfach",
            "fr": "les enfants vraiment heureux entre eux trois",
            "es": "los conquistadores con una nación adelante",
        }
        df = spark.createDataFrame(
            [(lang, text) for lang, text in samples.items()],
            "expected string, text string",
        ).select("expected", lang_id_trigram(F.col("text")).alias("got"))
        for r in df.collect():
            assert r["got"] == r["expected"], r

    def test_zero_hits_is_und(self, spark):
        df = spark.createDataFrame([("zzz qqq xxx",)], "text string")
        got = df.select(lang_id_trigram(F.col("text")).alias("l")).collect()
        assert got[0]["l"] == "und"

    def test_tie_breaks_to_greatest_code(self, spark):
        # ' de' is a signature trigram of BOTH fr and es; a text that
        # hits only it ties fr==es and must resolve to 'fr' (> 'es').
        assert " de" in LANG_TRIGRAMS["fr"] and " de" in LANG_TRIGRAMS["es"]
        df = spark.createDataFrame([("x de y",)], "text string")
        got = df.select(lang_id_trigram(F.col("text")).alias("l")).collect()
        assert got[0]["l"] == "fr"

    def test_hits_count_overlapless_occurrences(self, spark):
        # 'the' occurs twice in "the theory": "the" + "the(ory)";
        # replace() removes both, and ' th' (leading space) once more.
        df = spark.createDataFrame([("the theory",)], "text string")
        got = df.select(trigram_hits(F.col("text"), "en").alias("h"))
        # 'the' x2, 'he ' x1 ("the "), ' th' x1 (" theory"), rest 0
        assert got.collect()[0]["h"] == 4


class TestZipfFit:
    def test_exact_power_law_recovers_slope(self, spark):
        # Frequencies n(r) = 2^(10-r) for tokens t1..t5: ln n = ln 2^10
        # - r ln 2 ... but the fit is vs ln(rank), not rank, so build
        # an exact ln-ln line instead: n(r) = round(1000 / r) with
        # r in {1,2,4,8} is not exact either. Use two ranks -> the
        # fit line passes through both points exactly.
        rows = [(i, "alpha") for i in range(8)] + [(100, "beta beta")]
        # alpha: 8 occurrences (rank 1), beta: 2 (rank 2)
        df = _docs(spark, rows)
        row = zipf_fit(df, top_n=10).collect()[0]
        slope = (math.log(2) - math.log(8)) / (math.log(2) - math.log(1))
        assert row["zipf_slope"] == pytest.approx(slope, abs=1e-6)
        assert row["zipf_intercept"] == pytest.approx(math.log(8), abs=1e-6)
        assert row["n_ranks"] == 2
        assert row["n_types"] == 2
        assert row["n_tokens"] == 10

    def test_top_n_caps_ranks(self, spark):
        df = _docs(spark, [(1, "a a a b b c d e f g")])
        assert zipf_fit(df, top_n=3).collect()[0]["n_ranks"] == 3


class TestTopNgrams:
    def test_counts_and_deterministic_ties(self, spark):
        df = _docs(spark, [(1, "a b a b c"), (2, "a b x")])
        got = top_ngrams(df, n=2, k=10).orderBy("rank").collect()
        assert [(r["gram"], r["n"], r["rank"]) for r in got] == [
            ("a b", 3, 1),   # twice in doc1 ("a b a b"), once in doc2
            ("b a", 1, 2),   # count ties below break gram-ascending
            ("b c", 1, 3),
            ("b x", 1, 4),
        ]

    def test_k_truncates(self, spark):
        df = _docs(spark, [(1, "a b c d e")])
        assert top_ngrams(df, n=2, k=2).count() == 2

    def test_trigrams(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        got = {r["gram"] for r in top_ngrams(df, n=3, k=10).collect()}
        assert got == {"a b c", "b c d"}

    def test_short_docs_yield_nothing(self, spark):
        df = _docs(spark, [(1, "solo"), (2, "")])
        assert top_ngrams(df, n=2, k=10).count() == 0


class TestHostConcentration:
    def test_hand_checked_metrics(self, spark):
        # hosts a,a,a,b -> shares .75/.25: hhi = .625,
        # H = -(.75 ln .75 + .25 ln .25)
        df = spark.createDataFrame(
            [("a",), ("a",), ("a",), ("b",)], "host string"
        )
        row = host_concentration(df).collect()[0]
        assert row["n_hosts"] == 2
        assert row["top1_share"] == pytest.approx(0.75, abs=1e-6)
        assert row["top5_share"] == pytest.approx(1.0, abs=1e-6)
        assert row["hhi"] == pytest.approx(0.625, abs=1e-6)
        ent = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        assert row["host_entropy"] == pytest.approx(ent, abs=1e-6)

    def test_weighted(self, spark):
        df = spark.createDataFrame(
            [("a", 9), ("b", 1)], "host string, w long"
        )
        row = host_concentration(df, weight_col="w").collect()[0]
        assert row["top1_share"] == pytest.approx(0.9, abs=1e-6)

    def test_single_host_degenerate(self, spark):
        df = spark.createDataFrame([("only",)], "host string")
        row = host_concentration(df).collect()[0]
        assert row["hhi"] == pytest.approx(1.0, abs=1e-6)
        assert row["host_entropy"] == pytest.approx(0.0, abs=1e-6)


class TestWinnowing:
    def test_guarantee_shared_fingerprint_on_long_match(self, spark):
        from cloud_crawler_spark.functions.text import winnow_fingerprints

        # identical substring of length >= w+k-1 MUST share a selected
        # fingerprint (the winnowing guarantee)
        shared = "thequickbrownfoxjumps"   # len 21 >= 4+8-1
        df = spark.createDataFrame(
            [(1, "XXXX" + shared + "YYYYYY"), (2, "ZZ" + shared + "WW")],
            "doc_id long, text string",
        )
        out = winnow_fingerprints(df, k=8, window=4).collect()
        fps = {1: set(), 2: set()}
        for r in out:
            fps[r["doc_id"]].add(r["fp"])
        assert fps[1] & fps[2]

    def test_density_bound(self, spark):
        from cloud_crawler_spark.functions.text import winnow_fingerprints

        text = "abcdefghij" * 40  # periodic, 400 chars
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        n_sel = winnow_fingerprints(df, k=8, window=4).count()
        n_pos = len(text) - 7
        assert n_sel <= n_pos  # never denser than the hash sequence

    def test_short_and_empty_docs_yield_nothing(self, spark):
        from cloud_crawler_spark.functions.text import winnow_fingerprints

        df = spark.createDataFrame(
            [(1, "short"), (2, "")], "doc_id long, text string"
        )
        assert winnow_fingerprints(df, k=8, window=1).count() == 0

    def test_rightmost_min_positions_selected(self, spark):
        from cloud_crawler_spark.functions.text import winnow_fingerprints

        # repeated content: selections repeat at the period offset
        df = spark.createDataFrame(
            [(1, "abcdef" * 3)], "doc_id long, text string"
        )
        got = sorted(
            (r["pos"], r["fp"])
            for r in winnow_fingerprints(df, k=4, window=3).collect()
        )
        by_fp = {}
        for pos, fp in got:
            by_fp.setdefault(fp, []).append(pos)
        # every selected fp recurs at stride 6 (the content period)
        for fp, poss in by_fp.items():
            assert all((b - a) % 6 == 0 for a, b in zip(poss, poss[1:]))


class TestTranscode:
    def test_charset_detection_matrix(self, spark):
        from cloud_crawler_spark.sources.corpus import transcode_pages

        latin = "café résumé".encode("latin-1")
        gbk = "中文网页".encode("gbk")
        rows = [
            ("u", "http://x/utf", "<html>plain utf-8 ü</html>".encode()),
            ("m", "http://x/meta",
             b'<html><head><meta charset="latin-1"></head>' + latin + b"</html>"),
            ("g", "http://x/gbk",
             b'<html><meta http-equiv="Content-Type" '
             b'content="text/html; charset=GBK">' + gbk + b"</html>"),
            ("b", "http://x/bom", "bom page".encode("utf-8-sig")),
            ("x", "http://x/bad",
             b'<html><meta charset="no-such-codec">abc</html>'),
        ]
        pages = spark.createDataFrame(
            [(k, u, bytearray(b)) for k, u, b in rows],
            "k string, url string, html binary")
        got = {r.k: r for r in transcode_pages(pages).collect()}
        assert got["m"].charset == "latin-1"
        assert "café résumé" in bytes(got["m"].html).decode("utf-8")
        assert got["g"].charset == "gbk"
        assert "中文网页" in bytes(got["g"].html).decode("utf-8")
        assert got["b"].charset == "utf-8-sig"
        assert bytes(got["b"].html).decode("utf-8") == "bom page"
        assert got["x"].charset == "utf-8"  # unknown codec falls back
        assert got["u"].charset == "utf-8"

    def test_header_overrides_meta_and_string_passthrough(self, spark):
        from cloud_crawler_spark.sources.corpus import transcode_pages

        body = "naïve".encode("latin-1")
        pages = spark.createDataFrame(
            [("http://x/1", bytearray(
                b'<meta charset="utf-8">' + body), "text/html; charset=latin-1"),
             ],
            "url string, html binary, content_type string")
        [r] = transcode_pages(pages, content_type_col="content_type").collect()
        assert r.charset == "latin-1"  # header beats meta
        assert "naïve" in bytes(r.html).decode("utf-8")

        spages = spark.createDataFrame([("http://x/2", "already a str ü")],
                                       "url string, html string")
        [r2] = transcode_pages(spages).collect()
        assert bytes(r2.html).decode("utf-8") == "already a str ü"
