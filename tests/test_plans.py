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


def test_fused_parse_is_single_python_stage(spark):
    """Round-2 fusion: parse + absolutize + canonicalize + host + path
    all happen in ONE Arrow stage over page rows; the old second Python
    stage over the (10-50x larger) exploded link set must not exist.

    The plan is shaped like the round's pre-checkpoint block (a pure
    projection over the UDF struct — round.py crawled_ck). Exploding
    the UDF output DIRECTLY would let InferFiltersFromGenerate clone
    the UDF into a second ArrowEvalPython node; the round never does
    that (the localCheckpoint sits between parse and explode), and the
    node count here pins both facts.
    """
    import re

    from cloud_crawler_spark.functions.parse import with_parsed_resolved

    pages = spark.createDataFrame(
        [("http://h.com/a", bytearray(b"<a href='http://h.com/b'>x</a>"))],
        "url string, html binary",
    )
    # the crawled_ck shape: every parsed field projected in one pass
    block = with_parsed_resolved(pages).select(
        "url", "links", "base_href", "title", "page_text"
    )
    plan = plan_of(block)
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert "BatchEvalPython" not in plan

    # and the round really does explode AFTER the checkpoint boundary:
    import inspect

    from cloud_crawler_spark.plans import round as round_mod

    src = inspect.getsource(round_mod.run_round)
    assert src.index("localCheckpoint") < src.index("_expand_links")


def test_curation_queries_scale_guards(spark):
    """The round-3 curation operators must keep their 100 TB plan
    shapes: never a cartesian product, and the deliberately-broadcast
    probes (eval n-grams, blocklist) stay broadcast."""
    from cloud_crawler_spark.queries import queries

    qs = queries()
    sf = "/root/testdata/sf0.001"
    plans = {n: plan_of(qs[n](spark, sf))
             for n in ("q_decontaminate", "q_blocklist", "q_span_dedup",
                       "q_semdedup", "q_anchor_text")}
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    assert "BroadcastHashJoin" in plans["q_decontaminate"]
    assert "BroadcastHashJoin" in plans["q_blocklist"]
    # span dedup shuffles the 8-byte xxhash64 key, not span text
    assert "xxhash64" in plans["q_span_dedup"]


def test_exact_substr_and_dsir_scale_guards(spark):
    """ExactSubstr + DSIR keep their 100 TB plan shapes. The one-row
    scalar crossJoins inside DSIR (gram totals) are deliberate
    broadcast constants — what must NOT appear is a cartesian product
    or a Generate that re-evaluates the gram/window hashing per
    exploded row (the size-beside-explode trap: the generator output
    must be the only gram-expression consumer)."""
    from cloud_crawler_spark.queries import queries

    qs = queries()
    sf = "/root/testdata/sf0.001"
    xs = plan_of(qs["q_crossdoc_substr"](spark, sf))
    assert "CartesianProduct" not in xs
    # window text never shuffles: frequency groupBy keys on xxhash64
    assert "xxhash64" in xs

    ds = plan_of(qs["q_dsir_weights"](spark, sf))
    assert "CartesianProduct" not in ds
    # the scoring join is the broadcast of the n_buckets-row ratio
    assert "BroadcastHashJoin" in ds
    # the Generate that explodes gram buckets must not carry the text
    # column through as requiredChildOutput: that only happens when a
    # sibling projection (the size(<gram expr>) trap) re-consumes the
    # source text per EXPLODED row — measured 49s vs 0.5s at sf0.01.
    # n_grams comes from count() after the explode instead. A Generate
    # "Arguments:" line ends with ", [<requiredChildOutput>],
    # <outer>, [<generator output>]" in formatted explain.
    import re

    n_generates = 0
    for line in ds.splitlines():
        line = line.strip()
        if line.startswith("Arguments: explode("):
            n_generates += 1
            # requiredChildOutput prints as "[...], " when non-empty
            # and is omitted entirely when empty
            req = re.search(
                r"(?:\[([^\[\]]*)\], )?(?:true|false), \[[^\[\]]*\]$", line
            )
            assert req is not None, line
            assert "text#" not in (req.group(1) or ""), req.group(1)
    assert n_generates >= 1  # the guard must actually have inspected one


def test_index_ranking_scale_guards(spark):
    """The search-index operators keep their 100 TB plan shapes: no
    cartesian products beyond the deliberate ONE-ROW scalar
    crossJoins (N, avgdl — broadcast, constant-size), postings
    aggregate partially map-side, and the per-doc top-k window gets
    the partial group limit."""
    from cloud_crawler_spark.operators.index import tfidf_topk
    from cloud_crawler_spark.queries import queries

    qs = queries()
    sf = "/root/testdata/sf0.001"
    for name in ("q_inverted_index", "q_tfidf", "q_bm25",
                 "q_trap_detection", "q_index_delta"):
        plan = plan_of(qs[name](spark, sf))
        assert "CartesianProduct" not in plan, name
        # one-row scalar attachments plan as BroadcastNestedLoopJoin
        # with a 1-row build side — cheap by construction; anything
        # else nested-loop would be a blowup. bm25 has exactly two
        # (N x avgdl, then stats into the scored rows); the formatted
        # plan prints every node twice (tree + details), hence <= 4
        # occurrences.
        assert plan.count("BroadcastNestedLoopJoin") <= 4, name
        # partial aggregation reaches the map side
        assert "partial_" in plan or "HashAggregate" in plan, name

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b c")], "doc_id long, text string"
    )
    topk_plan = plan_of(tfidf_topk(docs, 2))
    assert "WindowGroupLimit" in topk_plan  # map-side partial top-k


def test_crawled_schema_single_source(spark):
    """round.CRAWLED_COLS is the canonical crawled column set: a live
    crawl's output and crawler._empty_crawled_schema (the zero-round
    result) must both carry exactly it — an empty crawl must
    unionByName cleanly with a real one (r5 review: meta_robots was
    missing from the empty schema)."""
    from cloud_crawler_spark import CrawlConfig, crawl
    from cloud_crawler_spark.plans.crawler import _empty_crawled_schema
    from cloud_crawler_spark.plans.round import CRAWLED_COLS

    from tests.helpers import make_corpus, make_seeds

    graph = {"0": {"links": ["1"]}, "1": {}}
    res = crawl(spark, make_corpus(spark, graph),
                make_seeds(spark, ["http://www.example.com/0"]), CrawlConfig())
    assert set(res.crawled.columns) == set(CRAWLED_COLS)

    empty = spark.createDataFrame([], _empty_crawled_schema())
    assert set(empty.columns) == set(CRAWLED_COLS)
    # and the two really do union
    res.crawled.unionByName(empty).count()
