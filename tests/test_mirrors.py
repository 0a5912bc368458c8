"""Mirror-site detection (operators/mirrors.py)."""

from pyspark.sql import functions as F

from cloud_crawler_spark.operators.mirrors import mirror_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, content_key string")


class TestMirrorPairs:
    def test_shared_content_and_jaccard(self, spark):
        rows = (
            [("a", f"k{i}") for i in range(4)]          # a: k0..k3
            + [("b", f"k{i}") for i in range(3)]        # b: k0..k2
            + [("c", "zz")]                             # unique host
        )
        out = mirror_pairs(_df(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.host_a, r.host_b, r.n_shared, r.n_a, r.n_b) == ("a", "b", 3, 4, 3)
        assert abs(r.jaccard - 0.75) < 1e-9  # 3 / (4 + 3 - 3)

    def test_duplicate_rows_count_once(self, spark):
        rows = [("a", "k"), ("a", "k"), ("b", "k"), ("a", "j"), ("b", "j")]
        out = mirror_pairs(_df(spark, rows)).collect()
        assert len(out) == 1 and out[0].n_shared == 2 and out[0].n_a == 2

    def test_min_shared_gate(self, spark):
        rows = [("a", "k"), ("b", "k")]
        assert mirror_pairs(_df(spark, rows), min_shared=2).count() == 0
        assert mirror_pairs(_df(spark, rows), min_shared=1).count() == 1

    def test_boilerplate_key_excluded_but_counts_in_totals(self, spark):
        # 'soft404' is on 5 hosts -> over the cap of 4: it must not
        # create pairs, but it still counts in each host's n_keys
        rows = [(h, "soft404") for h in "abcde"] + [
            ("a", "k1"), ("b", "k1"), ("a", "k2"), ("b", "k2")]
        out = mirror_pairs(_df(spark, rows), max_hosts_per_key=4).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n_shared, r.n_a, r.n_b) == (2, 3, 3)
        assert abs(r.jaccard - 0.5) < 1e-9  # 2 / (3 + 3 - 2)

    def test_no_cartesian_in_plan(self, spark):
        df = _df(spark, [("a", "k"), ("b", "k")])
        plan = mirror_pairs(df)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
