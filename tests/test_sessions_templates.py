"""Semantics tests for sessionization, URL template mining, and the
LR quality gate. Oracle parity lives in test_queries_oracle.py."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.functions.canon import url_template
from cloud_crawler_spark.functions.text import lr_quality_score
from cloud_crawler_spark.operators.sessions import sessionize


def _events(spark, rows):
    # rows: (user_id, iso_ts)
    return spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        e = _events(spark, [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:10:00"),   # 10 min: same session
            (1, "2024-01-01 01:00:00"),   # 50 min gap: new session
            (2, "2024-01-01 00:00:00"),
        ])
        got = {
            (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_sec"])
            for r in sessionize(e, gap_sec=1800).collect()
        }
        assert got == {(1, 1): (2, 600), (1, 2): (1, 0), (2, 1): (1, 0)}

    def test_gap_exactly_at_timeout_stays(self, spark):
        e = _events(spark, [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00"),   # == 1800s: NOT a break (<=)
        ])
        out = sessionize(e, gap_sec=1800).collect()
        assert len(out) == 1 and out[0]["n_events"] == 2

    def test_equal_timestamps_one_session(self, spark):
        e = _events(spark, [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:00:00"),
        ])
        out = sessionize(e).collect()
        assert len(out) == 1 and out[0]["n_events"] == 2

    def test_epochs_floor_subseconds(self, spark):
        e = _events(spark, [(1, "2024-01-01 00:00:07.9")])
        r = sessionize(e).collect()[0]
        assert r["start_epoch"] == r["end_epoch"]
        assert r["start_epoch"] % 10 == 7  # floored, not rounded to 8


class TestUrlTemplate:
    def test_collapses_digits_and_param_values(self, spark):
        df = spark.createDataFrame(
            [("http://h3.ex.com/cat7/item123?page=4&ref=abc#frag",)],
            "url string",
        )
        got = df.select(url_template(F.col("url")).alias("t")).collect()
        assert got[0]["t"] == "http://h{n}.ex.com/cat{n}/item{n}?page=*&ref=*#frag"

    def test_no_digits_no_query_identity(self, spark):
        df = spark.createDataFrame([("http://ex.com/about",)], "url string")
        got = df.select(url_template(F.col("url")).alias("t")).collect()
        assert got[0]["t"] == "http://ex.com/about"


class TestLrQualityScore:
    def test_stopword_rich_beats_salad(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat is in the hat and it is good for the dog."),
                (2, "zzqp vrtx kjhg wxcv bnml qsdf ghjk azer tyui opmn"),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in lr_quality_score(df).collect()}
        assert got[1]["lr_score"] > got[2]["lr_score"]
        assert got[1]["keep_lr"] == 1

    def test_score_bounds_and_empty_doc(self, spark):
        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        r = lr_quality_score(df).collect()[0]
        assert 0.0 <= r["lr_score"] <= 1.0

    def test_threshold_moves_gate(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat is in the hat and it is good for the dog.")],
            "doc_id long, text string",
        )
        assert lr_quality_score(df, threshold=0.0).collect()[0]["keep_lr"] == 1
        assert lr_quality_score(df, threshold=1.0).collect()[0]["keep_lr"] == 0


class TestTransitions:
    def _ev(self, spark, rows):
        # rows: (user_id, iso_ts, event_id, event_type)
        return spark.createDataFrame(
            rows, "user_id long, ts string, event_id long, event_type string"
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"),
            "event_id", "event_type",
        )

    def test_counts_within_session_only(self, spark):
        from cloud_crawler_spark.operators.sessions import transitions

        e = self._ev(spark, [
            (1, "2024-01-01 00:00:00", 0, "view"),
            (1, "2024-01-01 00:05:00", 1, "cart"),
            (1, "2024-01-01 02:00:00", 2, "view"),   # new session: no edge
            (1, "2024-01-01 02:01:00", 3, "cart"),
            (2, "2024-01-01 00:00:00", 4, "view"),
            (2, "2024-01-01 00:01:00", 5, "cart"),
        ])
        got = {
            (r["from_label"], r["to_label"]): (r["n_transitions"],
                                               r["n_entities"])
            for r in transitions(e, gap_sec=1800).collect()
        }
        assert got == {("view", "cart"): (3, 2)}

    def test_equal_timestamps_ordered_by_id(self, spark):
        from cloud_crawler_spark.operators.sessions import transitions

        e = self._ev(spark, [
            (1, "2024-01-01 00:00:00", 2, "c"),
            (1, "2024-01-01 00:00:00", 1, "b"),
            (1, "2024-01-01 00:00:00", 0, "a"),
        ])
        got = {(r["from_label"], r["to_label"])
               for r in transitions(e).collect()}
        assert got == {("a", "b"), ("b", "c")}  # id order, not input order

    def test_gap_exactly_at_timeout_keeps_edge(self, spark):
        from cloud_crawler_spark.operators.sessions import transitions

        e = self._ev(spark, [
            (1, "2024-01-01 00:00:00", 0, "a"),
            (1, "2024-01-01 00:30:00", 1, "b"),   # == 1800s: same session
        ])
        out = transitions(e, gap_sec=1800).collect()
        assert len(out) == 1 and out[0]["n_transitions"] == 1
