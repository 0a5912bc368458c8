"""C4-style line-level cleaning (functions/lines.py).

Pins every per-line predicate (terminal punctuation, min word count,
blacklist term, curly-brace code gate), the document-level gates
(lorem-ipsum term, min surviving lines), reassembly order, and the
scale shape (one projection, zero shuffle).
"""

from pyspark.sql import functions as F

from cloud_crawler_spark.functions.lines import (clean_lines, keep_line,
                                                 strip_common_lines)


def _run(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return clean_lines(df, **kw).collect()[0]


class TestLinePredicates:
    def test_good_line_survives(self, spark):
        r = _run(spark, "This line is perfectly fine.")
        assert (r.n_lines, r.n_kept) == (1, 1)
        assert r.clean_text == "" or r.keep_doc == 0  # min_kept=3 gate

    def test_terminal_punctuation_required(self, spark):
        r = _run(spark, "no terminal punctuation here", min_kept=0)
        assert r.n_kept == 0

    def test_question_bang_quote_are_terminal(self, spark):
        text = 'Is this a question?\nWhat a line!\nHe said "stop."'
        r = _run(spark, text, min_kept=0)
        assert r.n_kept == 3

    def test_min_words(self, spark):
        r = _run(spark, "Too short.", min_kept=0)
        assert r.n_kept == 0
        r = _run(spark, "Three words suffice.", min_kept=0)
        assert r.n_kept == 1

    def test_blacklist_case_insensitive(self, spark):
        r = _run(spark, "Please enable JavaScript to continue.", min_kept=0)
        assert r.n_kept == 0

    def test_brace_gate(self, spark):
        r = _run(spark, "var f = function() { return 1; }.", min_kept=0)
        assert r.n_kept == 0
        r = _run(spark, "var f = function() { return 1; }.",
                 min_kept=0, brace_gate=False)
        assert r.n_kept == 1


class TestDocGates:
    TEXT = ("Good first line right here.\n"
            "bad line no punctuation\n"
            "Good second line right here.\n"
            "Good third line right here.")

    def test_doc_kept_and_reassembled_in_order(self, spark):
        r = _run(spark, self.TEXT)
        assert r.keep_doc == 1
        assert r.clean_text.split("\n") == [
            "Good first line right here.",
            "Good second line right here.",
            "Good third line right here.",
        ]
        assert (r.n_lines, r.n_kept) == (4, 3)
        assert abs(r.removed_line_frac - 0.25) < 1e-9

    def test_lorem_ipsum_drops_doc(self, spark):
        r = _run(spark, self.TEXT + "\nThis is Lorem Ipsum filler text.")
        assert r.keep_doc == 0 and r.clean_text == ""

    def test_min_kept_drops_doc(self, spark):
        r = _run(spark, self.TEXT, min_kept=4)
        assert r.keep_doc == 0 and r.clean_text == ""


def test_zero_shuffle_plan(spark):
    """The whole clean pass must be one map-side projection — no
    Exchange anywhere (a 100 TB corpus cleans in a single pass)."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("Line for doc "), F.col("id").cast("string"),
                 F.lit(" ok.\nbad line")).alias("text"),
    )
    plan = clean_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestStripCommonLines:
    """Cross-corpus chrome stripping (strip_common_lines): the >=N
    distinct-doc census, blank-line structure preservation, ordered
    reassembly, the all-stripped empty-doc row, and both anti-join
    paths (broadcast and count-gated shuffle)."""

    def _corpus(self, spark, n=6):
        rows = [
            (i, "CHROME\n\nunique %d.\nbody text %d" % (i, i))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_common_line_stripped_everywhere(self, spark):
        out = strip_common_lines(self._corpus(spark), min_docs=6)
        rows = {r.doc_id: r for r in out.collect()}
        assert len(rows) == 6
        for i, r in rows.items():
            # chrome gone, blank kept, order preserved
            assert r.text_clean == "\nunique %d.\nbody text %d" % (i, i)
            assert r.n_lines == 4 and r.n_kept == 3

    def test_below_threshold_kept(self, spark):
        out = strip_common_lines(self._corpus(spark), min_docs=7)
        assert all(
            r.text_clean.startswith("CHROME\n") for r in out.collect()
        )

    def test_duplicates_within_one_doc_count_once(self, spark):
        # the census is count_distinct(doc): 5 repeats inside one doc
        # must not push a line over a min_docs=2 threshold
        df = spark.createDataFrame(
            [(0, "x\nx\nx\nx\nx"), (1, "other")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in
               strip_common_lines(df, min_docs=2).collect()}
        assert out[0].text_clean == "x\nx\nx\nx\nx"

    def test_all_stripped_doc_still_emits_row(self, spark):
        df = spark.createDataFrame(
            [(0, "CHROME"), (1, "CHROME"), (2, "CHROME")],
            "doc_id long, text string",
        )
        rows = strip_common_lines(df, min_docs=3).collect()
        assert len(rows) == 3
        assert all(r.text_clean == "" and r.n_kept == 0 and r.n_lines == 1
                   for r in rows)

    def test_shuffle_anti_join_path_identical(self, spark):
        df = self._corpus(spark)
        a = strip_common_lines(df, min_docs=6).collect()
        b = strip_common_lines(df, min_docs=6,
                               broadcast_max_lines=0).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestScopedChromeStrip:
    def test_scope_confines_counting(self, spark):
        from cloud_crawler_spark.functions.lines import strip_common_lines

        # 'SAME BANNER' appears in 3 docs of host A but only 1 of host B
        rows = [
            (1, "A", "SAME BANNER\nalpha"),
            (2, "A", "SAME BANNER\nbeta"),
            (3, "A", "SAME BANNER\ngamma"),
            (4, "B", "SAME BANNER\ndelta"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {
            r["doc_id"]: r["text_clean"]
            for r in strip_common_lines(df, min_docs=3,
                                        scope_col="host").collect()
        }
        # stripped within host A (3 >= 3), kept in host B (1 < 3)
        assert got[1] == "alpha" and got[3] == "gamma"
        assert got[4] == "SAME BANNER\ndelta"

    def test_unscoped_default_unchanged(self, spark):
        from cloud_crawler_spark.functions.lines import strip_common_lines

        rows = [(i, "SAME\nu%d" % i) for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["text_clean"]
               for r in strip_common_lines(df, min_docs=4).collect()}
        assert got[0] == "u0"


class TestPriorityDedup:
    def test_lowest_rank_wins_then_tiebreak(self, spark):
        from cloud_crawler_spark.operators.dedup import priority_dedup

        rows = [
            ("k1", 2, 10, "cc"),
            ("k1", 0, 11, "curated"),   # wins: rank 0
            ("k1", 0, 12, "curated2"),  # loses tiebreak to doc 11
            ("k2", 1, 20, "web"),
        ]
        df = spark.createDataFrame(
            rows, "fp string, source_rank int, doc_id long, body string"
        )
        got = {r["fp"]: (r["doc_id"], r["body"])
               for r in priority_dedup(df).collect()}
        assert got == {"k1": (11, "curated"), "k2": (20, "web")}
