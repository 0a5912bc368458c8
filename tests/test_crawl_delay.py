"""robots.txt Crawl-delay honored as per-host politeness budgets.

The Robotex gem (the reference's robots dependency, dsl_core.rb:69)
exposes Crawl-delay as #delay; the batch engine translates it into the
per-round fetch-budget currency (operators/robots.delay_budgets) and
threads it through select_budget as a broadcast override."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.operators import robots as R
from cloud_crawler_spark.operators.politeness import select_budget
from tests.helpers import crawled_names, make_corpus, make_seeds


class TestParseCrawlDelay:
    def test_group_selection_and_values(self):
        assert R.parse_crawl_delay("User-agent: *\nCrawl-delay: 10") == 10.0
        assert R.parse_crawl_delay("User-agent: *\nCrawl-Delay: 2.5") == 2.5
        # other-UA group does not apply
        assert R.parse_crawl_delay("User-agent: bot\nCrawl-delay: 10") is None
        # directive before any group applies (matches Allow/Disallow logic)
        assert R.parse_crawl_delay("Crawl-delay: 3") == 3.0
        assert R.parse_crawl_delay("User-agent: *\nCrawl-delay: junk") is None
        assert R.parse_crawl_delay("User-agent: *\nCrawl-delay: -1") is None
        assert R.parse_crawl_delay("") is None
        assert R.parse_crawl_delay(None) is None

    def test_delay_budgets_math(self, spark):
        delays = spark.createDataFrame(
            [("a", 10.0), ("b", 30.0), ("c", 120.0), ("d", 0.5)],
            "host string, crawl_delay double",
        )
        got = {r["host"]: r["budget"]
               for r in R.delay_budgets(delays, 60.0).collect()}
        # 60/10=6, 60/30=2, 60/120 -> floor 0 -> clamped 1, 60/0.5=120
        assert got == {"a": 6, "b": 2, "c": 1, "d": 120}


def _frontier(spark, spec):
    """spec: {host: n_urls} -> pending frontier rows in crawl order."""
    rows = []
    for host, n in spec.items():
        for i in range(n):
            u = f"http://{host}/p{i}"
            rows.append((u, u, host, 0, None, 0.0, 0, i, 0, "pending"))
    return spark.createDataFrame(
        rows,
        "url string, canon_url string, host string, depth int, referer string,"
        " priority double, parent_rank long, link_pos int, round_added int,"
        " status string",
    )


class TestSelectBudgetOverrides:
    def test_override_caps_only_listed_host(self, spark):
        pending = _frontier(spark, {"slow.com": 10, "fast.com": 10})
        budgets = spark.createDataFrame([("slow.com", 2)], "host string, budget int")
        sel, deferred = select_budget(pending, None, None, host_budgets=budgets)
        per = {r["host"]: r["n"] for r in
               sel.groupBy("host").agg(F.count("*").alias("n")).collect()}
        assert per == {"slow.com": 2, "fast.com": 10}
        assert deferred.count() == 8
        # deterministic order: the 2 selected are the lowest link_pos
        picked = sorted(r["link_pos"] for r in
                        sel.where("host = 'slow.com'").collect())
        assert picked == [0, 1]

    def test_override_tightens_global_host_budget(self, spark):
        pending = _frontier(spark, {"slow.com": 10, "fast.com": 10})
        budgets = spark.createDataFrame([("slow.com", 1)], "host string, budget int")
        sel, _ = select_budget(pending, 4, None, host_budgets=budgets)
        per = {r["host"]: r["n"] for r in
               sel.groupBy("host").agg(F.count("*").alias("n")).collect()}
        assert per == {"slow.com": 1, "fast.com": 4}

    def test_no_loss(self, spark):
        pending = _frontier(spark, {"slow.com": 7, "fast.com": 3})
        budgets = spark.createDataFrame([("slow.com", 3)], "host string, budget int")
        sel, deferred = select_budget(pending, None, 5, host_budgets=budgets)
        all_urls = {r["url"] for r in pending.collect()}
        got = {r["url"] for r in sel.collect()} | {r["url"] for r in deferred.collect()}
        assert got == all_urls
        assert sel.count() + deferred.count() == 10


class TestCrawlDelayEndToEnd:
    def _corpus(self, spark):
        graph = {"seed": {"links": [f"s{i}" for i in range(6)]
                          + [f"f{i}" for i in range(3)]}}
        for i in range(6):
            graph[f"s{i}"] = {}
        for i in range(3):
            graph[f"f{i}"] = {}
        graph["robots"] = {
            "robots_body": "User-agent: *\nCrawl-delay: 30\nDisallow: /s5",
        }
        return make_corpus(spark, graph)

    def test_delay_spreads_rounds_and_robots_still_gate(self, spark):
        corpus = self._corpus(spark)
        cfg = CrawlConfig(honor_crawl_delay=True, round_window_sec=60.0)
        res = crawl(spark, corpus, make_seeds(
            spark, ["http://www.example.com/seed"]), cfg)
        names = crawled_names(res)
        # everything eventually crawled except the robots-disallowed s5
        assert names == {"seed"} | {f"s{i}" for i in range(5)} \
            | {f"f{i}" for i in range(3)}
        # budget = floor(60/30) = 2/round for the one fixture host: the 8
        # allowed children need 4 rounds after the seed round
        per_round = {
            r["round"]: r["n"]
            for r in res.crawled.where("fetched AND code = 200")
            .groupBy("round").agg(F.count("*").alias("n")).collect()
        }
        assert per_round[0] == 1  # seed
        assert all(n <= 2 for rnd, n in per_round.items() if rnd > 0)
        assert max(per_round) >= 4

    def test_delay_ignored_when_flag_off(self, spark):
        corpus = self._corpus(spark)
        res = crawl(spark, corpus, make_seeds(
            spark, ["http://www.example.com/seed"]), CrawlConfig())
        per_round = {
            r["round"]: r["n"]
            for r in res.crawled.where("fetched AND code = 200")
            .groupBy("round").agg(F.count("*").alias("n")).collect()
        }
        # all 8 allowed children land in round 1
        assert per_round == {0: 1, 1: 8}


class TestOverrideSafety:
    def test_override_cannot_raise_above_host_budget(self, spark):
        """A site's tiny Crawl-delay must not grant it MORE fetches
        than the crawl's own politeness cap."""
        pending = _frontier(spark, {"slow.com": 10, "fast.com": 10})
        budgets = spark.createDataFrame([("slow.com", 8)], "host string, budget int")
        sel, _ = select_budget(pending, 3, None, host_budgets=budgets)
        per = {r["host"]: r["n"] for r in
               sel.groupBy("host").agg(F.count("*").alias("n")).collect()}
        assert per == {"slow.com": 3, "fast.com": 3}  # least(override, cap)

    def test_duplicate_override_rows_do_not_fan_out(self, spark):
        """Two (host, budget) rows for one host must not duplicate its
        frontier rows through the override join."""
        pending = _frontier(spark, {"slow.com": 6})
        budgets = spark.createDataFrame(
            [("slow.com", 4), ("slow.com", 2)], "host string, budget int")
        sel, deferred = select_budget(pending, None, None, host_budgets=budgets)
        urls = [r["url"] for r in sel.collect()]
        assert len(urls) == len(set(urls)) == 2  # min budget, no dup rows
        assert sel.count() + deferred.count() == 6
