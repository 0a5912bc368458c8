"""Search-index operators (operators/index.py): postings shape, TF-IDF,
BM25 ranking sanity + 100 TB plan guards. Value parity vs DuckDB is
pinned by the q_inverted_index / q_tfidf / q_bm25 oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.index import (
    bm25,
    doc_freq,
    doc_lengths,
    postings,
    tfidf_topk,
)


def _docs(spark):
    rows = [
        (0, "spark spark join"),
        (1, "join filter"),
        (2, "filter filter filter rare"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPostings:
    def test_flat_postings(self, spark):
        p = {(r["term"], r["doc_id"]): r["tf"] for r in postings(_docs(spark)).collect()}
        assert p[("spark", 0)] == 2 and p[("join", 0)] == 1
        assert p[("filter", 2)] == 3 and p[("rare", 2)] == 1

    def test_doc_freq_and_lengths(self, spark):
        d = _docs(spark)
        df = {r["term"]: r["df"] for r in doc_freq(postings(d)).collect()}
        assert df == {"spark": 1, "join": 2, "filter": 2, "rare": 1}
        dl = {r["doc_id"]: r["dl"] for r in doc_lengths(d).collect()}
        assert dl == {0: 3, 1: 2, 2: 4}


class TestRanking:
    def test_tfidf_topk_prefers_distinctive_terms(self, spark):
        top1 = {
            r["doc_id"]: r["term"]
            for r in tfidf_topk(_docs(spark), 1).collect()
        }
        # doc 0's top term is the doc-exclusive repeated "spark";
        # doc 2's is "filter" (tf 3 beats the rarer single "rare")
        assert top1[0] == "spark"
        assert top1[2] in ("filter", "rare")

    def test_bm25_ranks_matching_docs(self, spark):
        scores = {
            r["doc_id"]: r["score"]
            for r in bm25(_docs(spark), "filter").collect()
        }
        assert set(scores) == {1, 2}  # only docs containing "filter"
        assert scores[2] > scores[1]  # higher tf wins
        assert all(s > 0 for s in scores.values())

    def test_bm25_multi_term_sums(self, spark):
        scores = {
            r["doc_id"]: r["score"]
            for r in bm25(_docs(spark), "join filter").collect()
        }
        assert set(scores) == {0, 1, 2}
        single = {
            r["doc_id"]: r["score"]
            for r in bm25(_docs(spark), "join").collect()
        }
        # doc 1 matches both terms: multi-term score strictly higher
        assert scores[1] > single[1]


class TestPlanShape:
    def test_no_cartesian_or_nested_loop_blowup(self, spark):
        """The only nested-loop joins allowed are the one-row
        broadcast scalar attachments (N, avgdl); the term joins must
        be equi-joins."""
        plan = bm25(_docs(spark), "join filter")._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # query-term semi side is broadcast (tiny)
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_positional_postings_positions(spark):
    from cloud_crawler_spark.operators.index import positional_postings

    docs = spark.createDataFrame(
        [(1, "A  b a\nb a"), (2, "")], "doc_id long, text string")
    got = sorted((r.term, r.doc_id, r.pos)
                 for r in positional_postings(docs).collect())
    # positions index the empty-filtered lowercase sequence
    assert got == [("a", 1, 0), ("a", 1, 2), ("a", 1, 4),
                   ("b", 1, 1), ("b", 1, 3)]


def test_phrase_match_counts_and_overlap(spark):
    from cloud_crawler_spark.operators.index import (
        phrase_match, positional_postings,
    )

    docs = spark.createDataFrame(
        [(1, "x a b a b a y"),   # "a b a" overlaps: starts 1 and 3
         (2, "a b"),             # no "a b a"
         (3, "a  b a")],         # whitespace-insensitive: one match
        "doc_id long, text string")
    pos = positional_postings(docs)
    got = {r.doc_id: r.n_matches
           for r in phrase_match(pos, "a b a").collect()}
    assert got == {1: 2, 3: 1}
    # single-term phrase degenerates to tf
    single = {r.doc_id: r.n_matches
              for r in phrase_match(pos, "a").collect()}
    assert single == {1: 3, 2: 1, 3: 2}
    with pytest.raises(ValueError):
        phrase_match(pos, "   ")
