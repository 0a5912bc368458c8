"""Politeness budgets, round slicing, deferred-row recovery, skew.
Re-expresses batch slicing / job-limit semantics
(spec/batch_job_spec.rb:115-259, FIXTURES.md scenarios 12 & 15)."""

from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.operators.politeness import select_budget

from tests.helpers import crawled_names, make_corpus, make_seeds

FRONTIER_SCHEMA = (
    "canon_url string, url string, host string, depth int, referer string, "
    "priority double, round_added int, status string, parent_rank long, link_pos int"
)


def _frontier(spark, rows):
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def _row(i, host="a.com", priority=0.0, depth=0):
    u = f"http://{host}/p{i}"
    return (u, u, host, depth, None, priority, 0, "pending", 0, i)


def test_budget_selects_top_k_per_host(spark):
    rows = [_row(i, "a.com") for i in range(10)] + [_row(i, "b.com") for i in range(3)]
    selected, deferred = select_budget(_frontier(spark, rows), host_budget=4, batch_size=None)
    sel = selected.groupBy("host").count().collect()
    counts = {r["host"]: r["count"] for r in sel}
    assert counts == {"a.com": 4, "b.com": 3}
    assert deferred.count() == 6
    # deterministic: lowest link_pos win
    a_sel = {r["link_pos"] for r in selected.where("host='a.com'").collect()}
    assert a_sel == {0, 1, 2, 3}


def test_budget_priority_wins_over_position(spark):
    rows = [_row(0, priority=0.0), _row(1, priority=5.0), _row(2, priority=1.0)]
    selected, _ = select_budget(_frontier(spark, rows), host_budget=2, batch_size=None)
    sel = {r["link_pos"] for r in selected.collect()}
    assert sel == {1, 2}  # highest priority first


def test_global_batch_cap(spark):
    rows = [_row(i, f"h{i % 5}.com") for i in range(20)]
    selected, deferred = select_budget(_frontier(spark, rows), host_budget=None, batch_size=7)
    assert selected.count() == 7
    assert deferred.count() == 13


def test_salting_matches_unsalted_semantics(spark):
    """Two-stage salted top-k == plain per-host top-k (hot-host skew,
    FIXTURES.md scenario 15: 90% of rows on one host)."""
    rows = [_row(i, "hot.com", priority=float(i % 7)) for i in range(180)] + [
        _row(i, f"cold{i % 4}.com") for i in range(20)
    ]
    f = _frontier(spark, rows)
    for salt in (1, 8):
        sel, _ = select_budget(f, host_budget=5, batch_size=None, salt_buckets=salt)
        got = sorted(
            (r["host"], r["priority"], r["link_pos"]) for r in sel.collect()
        )
        if salt == 1:
            want = got
    assert got == want
    hot = [g for g in got if g[0] == "hot.com"]
    assert len(hot) == 5
    assert all(p == 6.0 for _, p, _ in hot)  # top priority class wins


def test_deferred_rows_recovered_in_later_rounds(spark):
    """No-loss guarantee (spec/batch_job_spec.rb:226-259): deferred rows
    are crawled in later rounds in rank order."""
    graph = {str(i): {} for i in range(9)}
    graph["0"] = {"links": [str(i) for i in range(1, 9)]}
    corpus = make_corpus(spark, graph)
    seeds = make_seeds(spark, ["http://www.example.com/0"])
    cfg = CrawlConfig(host_budget=3)
    res = crawl(spark, corpus, seeds, cfg)
    # all 9 eventually crawled despite 3/host/round
    assert crawled_names(res) == {str(i) for i in range(9)}
    assert res.rounds >= 3
    # every round obeyed the budget
    per_round = res.crawled.groupBy("round").count().collect()
    assert all(r["count"] <= 3 for r in per_round)
    # deferred counted in lineage
    assert res.lineage.agg(F.sum("deferred")).first()[0] > 0


def test_fanout_tree_with_batch_cap(spark):
    """FIXTURES.md scenario 12 (child_spawning_batch_job_spec.rb:28-37):
    3-ary tree to depth 3 = 40 nodes/seed; batch_size=10 forces
    multi-round slicing; every node still crawled exactly once."""
    def children(name, d):
        return [f"{name}{c}" for c in "abc"] if d < 3 else []

    graph, todo = {}, [("n", 0)]
    while todo:
        name, d = todo.pop()
        graph[name] = {"links": children(name, d)}
        todo += [(c, d + 1) for c in children(name, d)]
    corpus = make_corpus(spark, graph)
    res = crawl(
        spark, corpus, make_seeds(spark, ["http://www.example.com/n"]),
        CrawlConfig(batch_size=10),
    )
    assert res.crawled.count() == 40  # 1 + 3 + 9 + 27
    assert res.crawled.select("canon_url").distinct().count() == 40
    per_round = res.crawled.groupBy("round").count().collect()
    assert all(r["count"] <= 10 for r in per_round)
    assert res.rounds >= 4


class TestAllocateBudget:
    """Hamilton largest-remainder budget apportionment
    (operators/politeness.allocate_budget)."""

    def _alloc(self, spark, rows, total):
        from cloud_crawler_spark.operators.politeness import allocate_budget
        df = spark.createDataFrame(rows, "host string, weight long")
        return {r.host: r.budget
                for r in allocate_budget(df, total).collect()}

    def test_exact_total_and_proportionality(self, spark):
        a = self._alloc(spark, [("a", 50), ("b", 30), ("c", 20)], 100)
        assert a == {"a": 50, "b": 30, "c": 20}

    def test_largest_remainder_gets_extra(self, spark):
        # quotas 33.33.. each: floors 33+33+33=99, one +1 left;
        # equal remainders -> host ASC tie-break gives it to 'a'
        a = self._alloc(spark, [("a", 1), ("b", 1), ("c", 1)], 100)
        assert sum(a.values()) == 100
        assert a == {"a": 34, "b": 33, "c": 33}

    def test_zero_weight_hosts_get_zero(self, spark):
        a = self._alloc(spark, [("a", 7), ("z", 0), ("n", -3)], 10)
        assert a["z"] == 0 and a["n"] == 0 and a["a"] == 10

    def test_sum_invariant_under_skew(self, spark):
        rows = [(f"h{i}", (i * 97) % 13 + 1) for i in range(50)]
        a = self._alloc(spark, rows, 1234)
        assert sum(a.values()) == 1234
        assert len(a) == 50

    def test_budget_smaller_than_host_count(self, spark):
        # only the 3 largest remainders (= largest weights here,
        # floors all 0) get a unit
        a = self._alloc(spark, [(f"h{i}", i + 1) for i in range(10)], 3)
        assert sum(a.values()) == 3
        assert a["h9"] == 1 and a["h8"] == 1 and a["h7"] == 1


class TestAimdRates:
    def _log(self, spark, rows):
        return spark.createDataFrame(rows, "host string, round int, code int")

    def test_fold_semantics(self, spark):
        from cloud_crawler_spark.operators.politeness import aimd_rates

        # h1: throttle r0 (4->2), clean r1 (3), idle r2 (3), throttle
        # r3 (1), clean r4+r5 (2, 3)
        rows = [
            ("h1", 0, 429), ("h1", 0, 200),
            ("h1", 1, 200),
            ("h1", 3, 429),
            ("h1", 4, 200), ("h1", 5, 200),
            # h2: clean every round -> caps at init+6 below max
            *[("h2", r, 200) for r in range(6)],
        ]
        got = {r["host"]: (r["final_rate"], r["n_throttle_rounds"],
                           r["n_active_rounds"])
               for r in aimd_rates(self._log(spark, rows),
                                   n_rounds=6).collect()}
        assert got["h1"] == (3, 2, 5)
        assert got["h2"] == (10, 0, 6)

    def test_rate_floor_and_cap(self, spark):
        from cloud_crawler_spark.operators.politeness import aimd_rates

        rows = [("slow", r, 429) for r in range(6)]
        rows += [("fast", r, 200) for r in range(6)]
        got = {r["host"]: r["final_rate"]
               for r in aimd_rates(self._log(spark, rows), n_rounds=6,
                                   init_rate=15, max_rate=16).collect()}
        assert got["slow"] == 1    # halving floors at 1
        assert got["fast"] == 16   # additive increase caps


def test_compliance_audit_gaps_and_violations(spark):
    from cloud_crawler_spark.operators.politeness import compliance_audit

    log = spark.createDataFrame(
        [("a", 0.0), ("a", 1.0), ("a", 1.25), ("a", 3.0),   # gaps 1, .25, 1.75
         ("b", 10.0),                                        # single fetch
         ("c", 0.0), ("c", 0.5)],                            # gap .5
        "host string, fetch_ts double")
    delays = spark.createDataFrame([("a", 0.5)], "host string, delay_s double")
    got = {r.host: r for r in compliance_audit(log, delays).collect()}
    a = got["a"]
    assert (a.n_fetches, a.min_gap_s, a.violations, a.delay_s) == (4, 0.25, 1, 0.5)
    assert a.avg_gap_s == (1.0 + 0.25 + 1.75) / 3
    b = got["b"]
    assert (b.n_fetches, b.min_gap_s, b.avg_gap_s, b.violations) == (1, None, None, 0)
    c = got["c"]  # default delay 1.0 -> the 0.5 gap violates
    assert (c.violations, c.delay_s) == (1, 1.0)
