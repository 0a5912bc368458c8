"""Physical-plan assertions: the optimizations we rely on at 100 TB
must actually appear in the plan, not just in comments — predicate
pushdown into the parquet scan, broadcast joins for dim tables,
partial (map-side) aggregation, no Python UDF in built-in-only paths."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushed_to_parquet_scan(spark):
    from cloud_crawler_spark.queries import q_depth_gate

    plan = plan_of(q_depth_gate(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    from cloud_crawler_spark.queries import q_depth_gate

    plan = plan_of(q_depth_gate(spark, SF_DIR))
    # ReadSchema must not include unused wide columns
    read = plan.split("ReadSchema")[1][:300]
    assert "l_extendedprice" not in read
    assert "l_quantity" in read


def test_small_dims_broadcast(spark):
    from cloud_crawler_spark.queries import q05_local_supplier_volume

    plan = plan_of(q05_local_supplier_volume(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation(spark):
    from cloud_crawler_spark.queries import q_word_count

    plan = plan_of(q_word_count(spark, SF_DIR))
    # map-side combine: HashAggregate appears twice (partial + final)
    assert plan.count("HashAggregate") >= 2


def test_no_python_udf_in_builtin_paths(spark):
    """Dedup/text operators advertise built-in-only execution — their
    plans must not contain Python evals."""
    from cloud_crawler_spark.queries import (
        q_dedup_exact,
        q_fingerprint,
        q_lang_id,
        q_minhash_sig,
        q_simhash,
        q_token_stats,
    )

    for q in (q_dedup_exact, q_minhash_sig, q_simhash, q_token_stats, q_lang_id, q_fingerprint):
        plan = plan_of(q(spark, SF_DIR))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, q.__name__


def test_robots_gate_is_broadcast(spark):
    from cloud_crawler_spark.operators import robots as R

    rules = R.build_rules(
        spark,
        spark.createDataFrame(
            [("h.com", "User-agent: *\nDisallow: /x")], "host string, body string"
        ),
    )
    cands = spark.createDataFrame(
        [("h.com", "/x/1"), ("h.com", "/ok")], "host string, path string"
    )
    out = R.filter_allowed(cands, rules)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert [r["path"] for r in out.collect()] == ["/ok"]


def test_topk_window_gets_partial_group_limit(spark):
    """Spark 4 plans row_number()<=k as WindowGroupLimit (map-side
    partial top-k before the shuffle) — the property that keeps the
    politeness budget scalable on a hot host."""
    from cloud_crawler_spark.queries import q_politeness_topk

    plan = plan_of(q_politeness_topk(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan  # partial limit before the Exchange


def test_whole_stage_codegen_in_filter_chain(spark):
    from cloud_crawler_spark.queries import q_depth_gate

    df = q_depth_gate(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df.queryExecution() if hasattr(df, "queryExecution") else df._jdf.queryExecution(),
        "codegen",
    )
    assert "WholeStageCodegen" in plan
