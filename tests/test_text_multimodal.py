"""Text-analysis functions and multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.functions import multimodal as MM
from cloud_crawler_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and it was good", "en"),
        (1, "der hund und die katze sind nicht da, ich bin ein tier", "de"),
        (2, "le chat et la souris sont dans les champs", "fr"),
        (3, "el perro y la casa de los gatos en una calle", "es"),
        (4, "zzzz qqqq wwww", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_id(spark, docs):
    out = dict(
        docs.select("lang", TX.lang_id(F.col("text")).alias("p")).collect()
    )
    assert out["en"] == "en"
    assert out["de"] == "de"
    assert out["fr"] == "fr"
    assert out["es"] == "es"
    assert out["und"] == "und"


def test_token_counts(spark, docs):
    row = docs.where("doc_id = 0").select(
        TX.token_count(F.col("text")).alias("n"),
        TX.bpe_token_count(F.col("text")).alias("b"),
    ).first()
    assert row["n"] == 10
    assert row["b"] == 10  # plain words; punctuation would add tokens


def test_bpe_tokens_split_punct_and_numbers(spark):
    df = spark.createDataFrame([("ab12,cd!",)], "text string")
    n = df.select(TX.bpe_token_count(F.col("text")).alias("n")).first()["n"]
    assert n == 5  # ab | 12 | , | cd | !


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",)], "text string"
    )
    fps = [r[0] for r in df.select(TX.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]
    assert len(fps[0]) == 16


def test_rolling_hash(spark):
    from cloud_crawler_spark.functions.text import rolling_hash_py

    a = rolling_hash_py("abcdefghijklmnopqr", window=16)
    b = rolling_hash_py("XYZabcdefghijklmnopqr", window=16)
    # shared 16-char windows produce shared hashes (content-defined)
    assert set(a) & set(b)
    df = spark.createDataFrame([("abcdefghijklmnopqr",)], "text string")
    got = df.select(TX.rolling_hash_udf(F.col("text")).alias("h")).first()["h"]
    assert got == a


def test_quality_features(spark):
    df = spark.createDataFrame([("Hi there. All good!",)], "text string")
    row = df.select(*TX.quality_features(F.col("text"))).first()
    assert row["n_chars_meas"] == 19
    assert row["n_tokens"] == 4
    assert row["n_punct"] == 2


# ---------------------------------------------------------- multimodal


def test_multimodal_features_deterministic(spark):
    media = MM.synth_media(spark, 24)
    out = MM.extract_features(media, decode_stub=True, dim=8)
    rows = out.collect()
    assert len(rows) == 24
    by_id = {r["media_id"]: r for r in rows}
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: second run identical
    rows2 = MM.extract_features(media, decode_stub=True, dim=8).collect()
    assert {r["media_id"]: r["digest"] for r in rows2} == {
        r["media_id"]: r["digest"] for r in rows
    }
    assert by_id[0]["n_bytes"] > 0
    # feature_csv is the sortable permille form of the float feature
    for r in rows:
        pm = [int(x) for x in r["feature_csv"].split(",")]
        assert [round(f * 1000) for f in r["feature"]] == pm


def test_multimodal_stub_gate(spark):
    media = MM.synth_media(spark, 3)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        MM.extract_features(media, decode_stub=False).collect()


def test_frame_stub_gate(spark):
    """decode_stub=False must raise eagerly when pyav is absent (and
    'auto' must silently take the stub) — mirror of the PIL gate."""
    media = MM.synth_media(spark, 3)
    if MM._pyav_available():
        pytest.skip("pyav present: the real path is exercised below")
    with pytest.raises(NotImplementedError):
        MM.sample_frames(media, decode_stub=False)
    assert MM.sample_frames(media, decode_stub="auto").collect()


@pytest.mark.skipif(not MM._pyav_available(), reason="pyav not installed")
def test_frame_sampling_real_decode(spark):
    """With pyav installed, the real path decodes keyframes: encode a
    tiny synthetic video in-process and expect RGB24 frame bytes."""
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        vs = out.add_stream("h264", rate=4)
        vs.width, vs.height, vs.pix_fmt = 32, 24, "yuv420p"
        for i in range(8):
            arr = np.full((24, 32, 3), i * 16, dtype=np.uint8)
            for pkt in vs.encode(
                av.VideoFrame.from_ndarray(arr, format="rgb24")
            ):
                out.mux(pkt)
        for pkt in vs.encode():
            out.mux(pkt)
    media = spark.createDataFrame(
        [(0, "video", bytearray(buf.getvalue()), "video/mp4",
          None, None, 2000)],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.sample_frames(media, max_frames=2, decode_stub=False).collect()
    assert rows and all(len(r["frame_bytes"]) == 24 * 32 * 3 for r in rows)


def test_frame_sampling_plumbing(spark):
    media = MM.synth_media(spark, 30)
    frames = MM.sample_frames(media, every_n_bytes=16, max_frames=3)
    rows = frames.collect()
    assert rows, "video rows must produce frames"
    vids = {r["media_id"] for r in rows}
    kinds = dict(media.select("media_id", "kind").collect())
    assert all(kinds[m] == "video" for m in vids)
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in per.values())


# ------------------------------------------- curation ops (round 3)


def test_repetition_metrics_edges(spark):
    from cloud_crawler_spark.functions.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),          # grams: ab ba ab ba ab -> 5 occ, 2 distinct
            (1, "all tokens are unique here"),
            (2, "one"),                  # no 2-grams
            (3, ""),                     # empty text
            (4, "x x x x"),              # single gram repeated 3x
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert rows[0]["n_2grams"] == 5
    assert rows[0]["dup_2gram_frac"] == round(3 / 5, 6)
    assert rows[0]["top_2gram_frac"] == round(3 / 5, 6)
    assert rows[0]["keep_repetition"] == 0
    assert rows[1]["dup_2gram_frac"] == 0.0
    assert rows[1]["keep_repetition"] == 1
    for d in (2, 3):  # degenerate docs: zero grams, kept
        assert rows[d]["n_2grams"] == 0
        assert rows[d]["dup_2gram_frac"] == 0.0
        assert rows[d]["keep_repetition"] == 1
    assert rows[4]["n_2grams"] == 3
    assert rows[4]["dup_2gram_frac"] == round(2 / 3, 6)
    assert rows[4]["top_2gram_frac"] == 1.0


def test_stratified_sample_deterministic(spark):
    from cloud_crawler_spark.operators.sampling import (
        hash_permille, stratified_sample)
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    kept = stratified_sample(df, {"en": 250}, default_permille=750)
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in kept.collect())
    assert ids1 == ids2  # same plan, same rows — no RNG
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang")
               .agg(F.count("*").alias("n")).collect()}
    # ~25% of 1000 en, ~75% of 1000 zh (hash-uniform within +-6%)
    assert 190 <= by_lang["en"] <= 310
    assert 690 <= by_lang["zh"] <= 810
    # survival is a pure function of doc_id: subset input -> subset output
    sub = stratified_sample(df.where("doc_id < 500"), {"en": 250}, 750)
    assert set(r["doc_id"] for r in sub.collect()) == {
        i for i in ids1 if i < 500}
    # permille itself is stable and in range
    pm = df.select(hash_permille(F.col("doc_id")).alias("p")).collect()
    assert all(0 <= r["p"] <= 999 for r in pm)


def test_quality_buckets_shape(spark):
    from cloud_crawler_spark.operators.sampling import quality_buckets
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "the and of to in is that it for was"[: 3 + 4 * (i % 9)],
          "en" if i % 2 == 0 else "de") for i in range(60)],
        "doc_id long, text string, lang string",
    )
    out = quality_buckets(df, n_buckets=3)
    rows = out.collect()
    assert len(rows) == 60
    sizes = {(r["lang"], r["bucket"]) for r in rows}
    assert sizes == {(l, b) for l in ("en", "de") for b in (1, 2, 3)}
    per = out.groupBy("lang", "bucket").count().collect()
    assert all(r["count"] == 10 for r in per)  # 30 per lang / 3 buckets
    # head bucket has the max-stopword docs
    for lang in ("en", "de"):
        b1 = [r["n_stop"] for r in rows if r["lang"] == lang and r["bucket"] == 1]
        b3 = [r["n_stop"] for r in rows if r["lang"] == lang and r["bucket"] == 3]
        assert min(b1) >= max(b3)


class TestPiiScrub:
    def test_scrub_and_counts(self, spark):
        rows = spark.createDataFrame(
            [
                (0, "mail me at jo.doe+x@sub.example.co.uk today"),
                (1, "server 192.168.001.100 and 10.0.0.1 are up"),
                (2, "call +1 (555) 010-4242 or 555-0100-22334"),
                (3, "clean text with no pii at all"),
                (4, None),
            ],
            "id long, t string",
        ).select(
            "id", "t",
            TX.scrub_pii(F.col("t")).alias("s"),
            *TX.pii_counts(F.col("t")),
        ).collect()
        by = {r["id"]: r for r in rows}
        assert by[0]["s"] == "mail me at <EMAIL> today"
        assert (by[0]["n_emails"], by[0]["n_ips"], by[0]["n_phones"]) == (1, 0, 0)
        # IPs scrubbed BEFORE phones: the 15-char dotted IP must come
        # out as <IP>, not match the phone-shaped digit-run pattern
        assert by[1]["s"] == "server <IP> and <IP> are up"
        assert (by[1]["n_emails"], by[1]["n_ips"], by[1]["n_phones"]) == (0, 2, 0)
        assert by[2]["s"] == "call <PHONE> or <PHONE>"
        assert by[2]["n_phones"] == 2
        assert by[3]["s"] == by[3]["t"]
        assert by[4]["s"] is None


class TestNormalizeText:
    """functions/text.normalize_text_py / normalize_text_udf."""

    def test_nfc_composes(self):
        from cloud_crawler_spark.functions.text import normalize_text_py as n

        assert n("café") == "café"
        assert n("café") == "café"  # already-NFC is stable

    def test_controls_stripped_newline_kept(self):
        from cloud_crawler_spark.functions.text import normalize_text_py as n

        assert n("a\x00b\x07c\x7fd") == "abcd"
        assert n("line one\nline two") == "line one\nline two"

    def test_ws_collapse_and_trim(self):
        from cloud_crawler_spark.functions.text import normalize_text_py as n

        assert n("  a \t\t b  ") == "a b"
        # trailing newline survives (trim strips spaces only — SQL
        # trim() parity)
        assert n(" x \n") == "x \n" or n(" x \n") == "x\n"

    def test_none(self):
        from cloud_crawler_spark.functions.text import normalize_text_py as n

        assert n(None) is None

    def test_udf_matches_python(self, spark):
        from pyspark.sql import functions as F

        from cloud_crawler_spark.functions.text import (
            normalize_text_py, normalize_text_udf)

        rows = ["café x", "  a\tb ", "\x07ok", None]
        df = spark.createDataFrame([(r,) for r in rows], "t string")
        got = [r[0] for r in df.select(normalize_text_udf(F.col("t"))).collect()]
        assert got == [normalize_text_py(r) for r in rows]


class TestGopherQuality:
    """Full Gopher §A1.2 rule set (functions/text.gopher_quality):
    each gate trips independently, degenerate docs survive the
    arithmetic, and the pass stays one codegen projection."""

    GOOD = ("The quick crawl have to be of and that with many plain "
            "words here. " * 5).strip()  # 70 words, all gates green

    def _run(self, spark, text, **kw):
        from cloud_crawler_spark.functions.text import gopher_quality
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return gopher_quality(df, **kw).collect()[0]

    def test_good_doc_kept(self, spark):
        r = self._run(spark, self.GOOD)
        assert r.keep_quality == 1 and r.n_words == 70
        assert r.n_stopwords == 8 and r.alpha_frac == 1.0

    def test_word_count_bounds(self, spark):
        assert self._run(spark, "The be to of and that have with.").keep_quality == 0
        assert self._run(spark, self.GOOD, max_words=60).keep_quality == 0

    def test_mean_word_length_gates(self, spark):
        r = self._run(spark, self.GOOD + " " + "a " * 300)
        assert r.mean_word_len < 3 and r.keep_quality == 0

    def test_symbol_ratio(self, spark):
        r = self._run(spark, self.GOOD + " " + "# " * 10)
        assert r.symbol_ratio > 0.1 and r.keep_quality == 0
        # '…' and non-overlapping '...' both count
        r2 = self._run(spark, self.GOOD + " x… y... z......")
        assert r2.symbol_ratio == round(4 / r2.n_words, 6)

    def test_bullet_lines(self, spark):
        text = self.GOOD + ("\n• b" * 20) + ("\n- c" * 10)
        r = self._run(spark, text)
        assert r.bullet_frac == round(30 / 31, 6) and r.keep_quality == 0
        # '-x' without a space is a word, not a bullet
        assert self._run(spark, self.GOOD + "\n-hyphenated").bullet_frac == 0.0

    def test_ellipsis_lines(self, spark):
        r = self._run(spark, self.GOOD + "\ntrails off...\nand more…  ")
        assert r.ellipsis_frac == round(2 / 3, 6) and r.keep_quality == 0

    def test_alpha_fraction(self, spark):
        r = self._run(spark, self.GOOD + " " + "123 456 789 " * 6)
        assert r.alpha_frac < 0.8 and r.keep_quality == 0

    def test_stopword_gate(self, spark):
        r = self._run(spark, "crawl data rows " * 20)
        assert r.n_stopwords == 0 and r.keep_quality == 0
        r2 = self._run(spark, "the " + "crawl data rows " * 20 + "with")
        assert r2.n_stopwords == 2

    def test_empty_doc_survives_arithmetic(self, spark):
        r = self._run(spark, "")
        assert r.n_words == 0 and r.keep_quality == 0
        assert r.mean_word_len == 0.0 and r.alpha_frac == 0.0

    def test_single_projection_plan(self, spark):
        from cloud_crawler_spark.functions.text import gopher_quality
        from pyspark.sql import functions as F
        df = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.lit(self.GOOD).alias("text"),
        )
        plan = gopher_quality(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestUnitRepetition:
    """Gopher §A1.1 duplicate line/paragraph fractions
    (functions/text.unit_repetition_metrics)."""

    def _run(self, spark, text, unit="line", **kw):
        from cloud_crawler_spark.functions.text import unit_repetition_metrics
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return unit_repetition_metrics(df, unit, **kw).collect()[0]

    def test_no_dups(self, spark):
        r = self._run(spark, "one line.\nanother line.\nthird.")
        assert r.n_lines == 3 and r.dup_line_frac == 0.0
        assert r.dup_line_char_frac == 0.0 and r.keep_lines == 1

    def test_line_dup_fractions(self, spark):
        # 'abcd' x3 (4 chars), 'xy' x1: dup occurrences 2/4,
        # dup chars 8/14
        r = self._run(spark, "abcd\nabcd\nabcd\nxy")
        assert r.n_lines == 4
        assert r.dup_line_frac == 0.5
        assert r.dup_line_char_frac == round(8 / 14, 6)
        assert r.keep_lines == 0

    def test_blank_lines_ignored(self, spark):
        r = self._run(spark, "a.\n\n  \n\nb.")
        assert r.n_lines == 2 and r.dup_line_frac == 0.0

    def test_paragraph_split_on_blank_runs(self, spark):
        text = "para one\nstill one\n\npara two\n \npara one\nstill one"
        r = self._run(spark, text, unit="paragraph")
        assert r.n_paragraphs == 3
        assert r.dup_paragraph_frac == round(1 / 3, 6)

    def test_empty_doc_survives(self, spark):
        r = self._run(spark, "")
        assert r.n_lines == 0 and r.dup_line_frac == 0.0
        assert r.keep_lines == 1

    def test_gates_thresholds(self, spark):
        r = self._run(spark, "a.\nb.\nc.\nd.\ne.\ne.",
                      max_dup_frac=0.1)
        assert r.keep_lines == 0


class TestScriptProfileEntropy:
    """Unicode-script mix + char entropy (functions/text.script_profile,
    char_entropy)."""

    def _sp(self, spark, text, **kw):
        from cloud_crawler_spark.functions.text import script_profile
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return script_profile(df, **kw).collect()[0]

    def _ent(self, spark, text):
        from cloud_crawler_spark.functions.text import char_entropy
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return char_entropy(df).collect()[0]

    def test_pure_latin(self, spark):
        r = self._sp(spark, "plain english words here")
        assert r.frac_latin == round(21 / 21, 6)
        assert r.n_scripts == 1 and r.mixed_script == 0

    def test_mixed_cyrillic_flagged(self, spark):
        r = self._sp(spark, "buy cheap поддельные товары now")
        assert r.frac_cyrillic > 0.05 and r.frac_latin > 0.05
        assert r.mixed_script == 1

    def test_small_salting_below_threshold(self, spark):
        # one Cyrillic char in a long Latin doc: homoglyph present but
        # under the 5% gate -> not 'mixed', frac still nonzero
        r = self._sp(spark, "a" * 100 + "о")
        assert 0 < r.frac_cyrillic < 0.05 and r.mixed_script == 0

    def test_digit_fraction_and_whitespace_excluded(self, spark):
        r = self._sp(spark, "ab 12  34")
        assert r.n_chars == 6
        assert r.frac_digit == round(4 / 6, 6)

    def test_entropy_uniform_vs_constant(self, spark):
        import math
        u = self._ent(spark, "abcd")
        assert abs(u.entropy_nats - round(math.log(4), 6)) < 1e-6
        c = self._ent(spark, "aaaaaaaa")
        assert c.entropy_nats == 0.0

    def test_entropy_empty_doc(self, spark):
        r = self._ent(spark, "")
        assert r.entropy_nats == 0.0 and r.n_chars == 0

    def test_script_profile_single_projection(self, spark):
        from cloud_crawler_spark.functions.text import script_profile
        from pyspark.sql import functions as F
        df = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit("text here").alias("text"))
        plan = script_profile(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


# ------------------------------------------------- content-defined chunking


class TestCDC:
    def _blob(self, seed: bytes, n: int) -> bytes:
        import hashlib as H
        out = b""
        cur = seed
        while len(out) < n:
            cur = H.md5(cur).digest()
            out += cur
        return out[:n]

    def test_chunks_partition_blob_exactly(self, spark):
        from cloud_crawler_spark.functions.multimodal import cdc_chunks

        data = self._blob(b"a", 5000)
        df = spark.createDataFrame([(1, data), (2, b""), (3, b"xy")],
                                   "media_id long, bytes binary")
        rows = sorted(cdc_chunks(df).collect(),
                      key=lambda r: (r.media_id, r.chunk_idx))
        by_id = {}
        for r in rows:
            by_id.setdefault(r.media_id, []).append(r)
        c1 = by_id[1]
        assert c1[0].offset == 0
        for a, b in zip(c1, c1[1:]):
            assert b.offset == a.offset + a.length
        assert sum(r.length for r in c1) == 5000
        assert all(64 <= r.length <= 1024 for r in c1[:-1])
        assert len(c1) > 1
        # empty blob -> no chunks; tiny blob -> one chunk
        assert 2 not in by_id
        assert [ (r.offset, r.length) for r in by_id[3] ] == [(0, 2)]

    def test_shift_resistance_shares_tail_chunks(self, spark):
        from cloud_crawler_spark.functions.multimodal import cdc_chunks

        tail = self._blob(b"t", 6000)
        a = self._blob(b"head-a", 300) + tail
        b = self._blob(b"head-bb", 451) + tail  # different length prefix
        df = spark.createDataFrame([(1, a), (2, b)],
                                   "media_id long, bytes binary")
        rows = cdc_chunks(df).collect()
        h1 = {r.chunk_hash for r in rows if r.media_id == 1}
        h2 = {r.chunk_hash for r in rows if r.media_id == 2}
        shared = h1 & h2
        # the unequal-offset heads force fixed-size chunking to share
        # NOTHING; CDC re-synchronizes and shares most of the tail
        assert len(shared) >= max(len(h1), len(h2)) // 2

    def test_chunk_dedup_reports_savings(self, spark):
        from cloud_crawler_spark.functions.multimodal import (
            cdc_chunks, chunk_dedup,
        )

        blob = self._blob(b"dup", 4000)
        df = spark.createDataFrame(
            [(1, blob), (2, blob), (3, self._blob(b"uniq", 4000))],
            "media_id long, bytes binary")
        chunks = cdc_chunks(df)
        dd = chunk_dedup(chunks).collect()
        assert dd, "identical blobs must share chunks"
        for r in dd:
            assert r.n_copies == 2 and r.bytes_saved == r.length
        # dedup determinism across partitioning
        again = chunk_dedup(cdc_chunks(df.repartition(5))).collect()
        assert sorted((r.chunk_hash, r.n_copies) for r in dd) == \
            sorted((r.chunk_hash, r.n_copies) for r in again)

    def test_avg_size_must_be_pow2(self, spark):
        from cloud_crawler_spark.functions.multimodal import cdc_chunks

        df = spark.createDataFrame([(1, b"x")], "media_id long, bytes binary")
        import pytest as _pt
        with _pt.raises(ValueError):
            cdc_chunks(df, avg_size=300)
