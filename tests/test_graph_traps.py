"""Unit semantics for HITS (operators/graph.hits) and crawler-trap
detection (operators/traps.py). Value parity vs DuckDB is pinned by
the q_hits / q_trap_detection oracles; these pin hand-checkable
shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.graph import hits
from cloud_crawler_spark.operators.traps import trap_hosts, trap_scores, with_template


def _store(spark, edges, nodes=None):
    """Minimal crawled-store shape for link_edges_of: url/canon_url +
    raw href links."""
    by_src = {}
    for s, d in edges:
        by_src.setdefault(s, []).append(f"http://g.com/{d}")
    nodes = nodes or sorted({n for e in edges for n in e})
    rows = [
        (f"http://g.com/{n}", f"http://g.com/{n}", by_src.get(n, []))
        for n in nodes
    ]
    return spark.createDataFrame(
        rows, "url string, canon_url string, links array<string>"
    )


class TestHits:
    def test_star_graph_hub_and_authority(self, spark):
        # 0 -> 1,2,3 : node 0 is the only hub; 1,2,3 equal authorities
        crawled = _store(spark, [("0", "1"), ("0", "2"), ("0", "3")])
        r = {x["canon_url"].rsplit("/", 1)[1]: x for x in hits(crawled).collect()}
        assert r["0"]["hub"] == pytest.approx(1.0)
        assert r["0"]["authority"] == 0.0
        for n in "123":
            assert r[n]["authority"] == pytest.approx(1 / 3)
            assert r[n]["hub"] == 0.0

    def test_scores_sum_to_one(self, spark):
        edges = [(str(i), str((i * 3 + 1) % 7)) for i in range(7)] + [
            (str(i), str((i * 5 + 2) % 7)) for i in range(7)
        ]
        r = hits(_store(spark, edges), iterations=3)
        agg = r.agg(F.sum("authority"), F.sum("hub")).collect()[0]
        assert agg[0] == pytest.approx(1.0)
        assert agg[1] == pytest.approx(1.0)

    def test_empty_store(self, spark):
        empty = spark.createDataFrame(
            [], "url string, canon_url string, links array<string>"
        )
        assert hits(empty).count() == 0


class TestTraps:
    def _urls(self, spark):
        rows = [("trap.com", f"/cal/{y}/{m}") for y in range(2000, 2020)
                for m in range(1, 13)]
        rows += [("ok.com", p) for p in ("/about", "/contact", "/pricing")]
        rows += [("mixed.com", "/post/1"), ("mixed.com", "/post/2"),
                 ("mixed.com", "/faq")]
        return spark.createDataFrame(rows, "host string, path string")

    def test_templates_collapse_digits(self, spark):
        t = with_template(self._urls(spark))
        tmpl = {r["template"] for r in t.where("host = 'trap.com'").collect()}
        assert tmpl == {"/cal/N/N"}

    def test_scores(self, spark):
        s = {r["host"]: r for r in trap_scores(self._urls(spark)).collect()}
        assert s["trap.com"]["n_urls"] == 240 and s["trap.com"]["n_templates"] == 1
        assert s["ok.com"]["urls_per_template"] == pytest.approx(1.0)
        assert s["mixed.com"]["n_templates"] == 2  # /post/N + /faq

    def test_trap_hosts_threshold(self, spark):
        flagged = [r["host"] for r in trap_hosts(self._urls(spark), 100.0).collect()]
        assert flagged == ["trap.com"]


class TestTrustRank:
    """operators/graph.trustrank — value parity is pinned by the
    q_trustrank oracle; these pin the spam-demotion semantics."""

    def _web(self, spark):
        # trusted t -> a -> b ; spam farm s1 <-> s2 disconnected from t
        edges = [("t", "a"), ("a", "b"), ("s1", "s2"), ("s2", "s1")]
        return _store(spark, edges)

    def test_spam_cluster_gets_zero(self, spark):
        from cloud_crawler_spark.operators.graph import trustrank

        store = self._web(spark)
        trusted = spark.createDataFrame(
            [("http://g.com/t",)], "canon_url string"
        )
        r = {row.canon_url: row.rank for row in
             trustrank(store, trusted, iterations=3).collect()}
        assert r["http://g.com/s1"] == 0.0 and r["http://g.com/s2"] == 0.0
        # trust decays along the chain but reaches both hops
        assert r["http://g.com/t"] > r["http://g.com/a"] > r["http://g.com/b"] > 0

    def test_untrusted_seed_ignored_and_empty(self, spark):
        from cloud_crawler_spark.operators.graph import trustrank

        store = self._web(spark)
        ghost = spark.createDataFrame(
            [("http://nowhere.com/x",)], "canon_url string"
        )
        assert trustrank(store, ghost).count() == 0
