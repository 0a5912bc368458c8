"""shortest_paths (PageStore#shortest_paths! parity) — the reference's
dormant spec scenario re-expressed: spec/redis_page_store_spec.rb:122-145
(redirect hop costs 0: page 1 redirects to 2 and both sit at depth 1)."""

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.operators.graph import shortest_paths
from tests.helpers import make_corpus, make_seeds

HOST = "www.example.com"


def _depths(sp_df):
    return {
        r["canon_url"].replace(f"http://{HOST}/", ""): r["depth"]
        for r in sp_df.collect()
    }


def test_shortest_paths_reference_spec(spark):
    # FakePage graph from the spec: 0 -> [1, 3]; 1 redirects to 2;
    # 2 -> [4]; 3, 4 leaves
    graph = {
        "0": {"links": ["1", "3"]},
        "1": {"redirect_to": f"http://{HOST}/2"},
        "2": {"links": ["4"]},
        "3": {},
        "4": {},
    }
    res = crawl(
        spark, make_corpus(spark, graph), make_seeds(spark, [f"http://{HOST}/0"]),
        CrawlConfig(),
    )
    sp = shortest_paths(res.crawled, f"http://{HOST}/0")
    d = _depths(sp)
    assert d["0"] == 0
    assert d["1"] == 1       # link hop
    assert d["2"] == 1       # redirect hop from 1 is free (spec line 143)
    assert d["3"] == 1
    assert d["4"] == 2
    assert all(r["visited"] for r in sp.collect())


def test_shortest_paths_finds_shorter_route_than_discovery(spark):
    # crawl-time depth is discovery depth; a later-added shortcut must
    # win in the recompute. chain 0->1->2->3 plus direct 0->3.
    graph = {
        "0": {"links": ["1", "3"]},
        "1": {"links": ["2"]},
        "2": {"links": ["3"]},
        "3": {"links": []},
    }
    res = crawl(
        spark, make_corpus(spark, graph), make_seeds(spark, [f"http://{HOST}/0"]),
        CrawlConfig(),
    )
    # root at 1: 3 is reachable only via 2 (depth 2), NOT via the seed edge
    sp = shortest_paths(res.crawled, f"http://{HOST}/1")
    d = _depths(sp)
    assert d["1"] == 0 and d["2"] == 1 and d["3"] == 2
    assert d["0"] is None  # unreachable from 1
    visited = {r["canon_url"].replace(f"http://{HOST}/", ""): r["visited"]
               for r in sp.collect()}
    assert visited == {"0": False, "1": True, "2": True, "3": True}


def _expected_pagerank(nodes, edges, iterations=3, damping=0.85):
    """Plain-python power iteration with uniform dangling spread."""
    n = len(nodes)
    out = {u: [v for (s, v) in edges if s == u] for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(iterations):
        contrib = {u: 0.0 for u in nodes}
        dm = 0.0
        for u in nodes:
            if out[u]:
                share = r[u] / len(out[u])
                for v in out[u]:
                    contrib[v] += share
            else:
                dm += r[u]
        r = {u: (1 - damping) / n + damping * (contrib[u] + dm / n)
             for u in nodes}
    return r


def test_pagerank_matches_reference_iteration(spark):
    from cloud_crawler_spark.operators.graph import pagerank

    # 2 is dangling: its mass must spread uniformly, not vanish
    graph = {
        "0": {"links": ["1", "2"]},
        "1": {"links": ["0"]},
        "2": {"links": []},
    }
    res = crawl(
        spark, make_corpus(spark, graph), make_seeds(spark, [f"http://{HOST}/0"]),
        CrawlConfig(),
    )
    got = {
        r["canon_url"].replace(f"http://{HOST}/", ""): r["rank"]
        for r in pagerank(res.crawled, iterations=3).collect()
    }
    want = _expected_pagerank(
        ["0", "1", "2"], [("0", "1"), ("0", "2"), ("1", "0")], iterations=3
    )
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_ignores_edges_leaving_the_store(spark):
    from cloud_crawler_spark.operators.graph import pagerank

    # 1 links to an unfetched URL: that edge must not leak rank mass
    graph = {
        "0": {"links": ["1"]},
        "1": {"links": ["0", "missing-from-corpus"]},
    }
    res = crawl(
        spark, make_corpus(spark, graph), make_seeds(spark, [f"http://{HOST}/0"]),
        CrawlConfig(),
    )
    stored = res.crawled.where("code = 200")
    got = {
        r["canon_url"].replace(f"http://{HOST}/", ""): r["rank"]
        for r in pagerank(stored, iterations=2).collect()
    }
    assert set(got) == {"0", "1"}
    # 1's only IN-STORE edge is to 0, so it behaves as out-degree 1
    want = _expected_pagerank(["0", "1"], [("0", "1"), ("1", "0")], iterations=2)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


class TestCocitationCoupling:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src long, dst long")

    def test_cocitation_counts(self, spark):
        from cloud_crawler_spark.operators.graph import cocitation

        # 0 cites {10,11}; 1 cites {10,11}; 2 cites {10}
        e = self._edges(spark, [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10)])
        got = {(r["a"], r["b"]): r["n_common"]
               for r in cocitation(e).collect()}
        assert got == {(10, 11): 2}

    def test_cocitation_min_common_and_duplicate_edges(self, spark):
        from cloud_crawler_spark.operators.graph import cocitation

        e = self._edges(spark, [(0, 10), (0, 10), (0, 11), (1, 10), (1, 12)])
        got = {(r["a"], r["b"]): r["n_common"]
               for r in cocitation(e, min_common=1).collect()}
        # duplicate (0,10) edge counts once; singleton pairs kept at min 1
        assert got == {(10, 11): 1, (10, 12): 1}
        assert cocitation(e, min_common=2).count() == 0

    def test_cocitation_hub_gate(self, spark):
        from cloud_crawler_spark.operators.graph import cocitation

        rows = [(0, d) for d in range(10)] + [(1, 3), (1, 4)]
        e = self._edges(spark, rows)
        got = {(r["a"], r["b"]) for r in
               cocitation(e, max_out_degree=5).collect()}
        # the degree-10 hub is excluded before the join
        assert got == {(3, 4)}

    def test_coupling_counts_and_gate(self, spark):
        from cloud_crawler_spark.operators.graph import (
            bibliographic_coupling,
        )

        # 0 and 1 both cite {10, 11}; everyone cites 99 (homepage)
        e = self._edges(
            spark,
            [(0, 10), (0, 11), (1, 10), (1, 11),
             (0, 99), (1, 99), (2, 99), (3, 99)],
        )
        got = {(r["a"], r["b"]): r["n_common"]
               for r in bibliographic_coupling(e, max_in_degree=3).collect()}
        assert got == {(0, 1): 2}


def _expected_opic(nodes, edges, iterations=3):
    """Plain-python synchronous OPIC with uniform dangling spread."""
    n = len(nodes)
    out = {u: [v for (s, v) in edges if s == u] for u in nodes}
    c = {u: 1.0 / n for u in nodes}
    h = {u: 0.0 for u in nodes}
    for _ in range(iterations):
        nxt = {u: 0.0 for u in nodes}
        dm = 0.0
        for u in nodes:
            h[u] += c[u]
            if out[u]:
                for v in out[u]:
                    nxt[v] += c[u] / len(out[u])
            else:
                dm += c[u]
        c = {u: nxt[u] + dm / n for u in nodes}
    return {u: (h[u] + c[u]) / (iterations + 1) for u in nodes}


class TestOpic:
    def test_matches_reference_iteration_with_dangling(self, spark):
        from cloud_crawler_spark.operators.graph import opic

        # 2 is dangling: its cash must spread uniformly, not vanish
        graph = {
            "0": {"links": ["1", "2"]},
            "1": {"links": ["0"]},
            "2": {"links": []},
        }
        res = crawl(
            spark, make_corpus(spark, graph),
            make_seeds(spark, [f"http://{HOST}/0"]), CrawlConfig(),
        )
        got = {
            r["canon_url"].replace(f"http://{HOST}/", ""): r["importance"]
            for r in opic(res.crawled, iterations=3).collect()
        }
        want = _expected_opic(
            ["0", "1", "2"], [("0", "1"), ("0", "2"), ("1", "0")],
            iterations=3,
        )
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
        assert abs(sum(got.values()) - 1.0) < 1e-9  # probability vector

    def test_hub_outranks_leaf(self, spark):
        from cloud_crawler_spark.operators.graph import opic

        # everyone links 0; 0 links 1 — 0 accumulates the cash
        graph = {
            "0": {"links": ["1"]},
            "1": {"links": ["0"]},
            "2": {"links": ["0"]},
            "3": {"links": ["0"]},
        }
        res = crawl(
            spark, make_corpus(spark, graph),
            make_seeds(spark, [f"http://{HOST}/0", f"http://{HOST}/2",
                               f"http://{HOST}/3"]), CrawlConfig(),
        )
        # odd iteration count: the 0<->1 cycle parks the banked cash
        # on 0 (even counts balance the two — the cash oscillates)
        got = {
            r["canon_url"].replace(f"http://{HOST}/", ""): r["importance"]
            for r in opic(res.crawled, iterations=3).collect()
        }
        want = _expected_opic(
            ["0", "1", "2", "3"],
            [("0", "1"), ("1", "0"), ("2", "0"), ("3", "0")],
            iterations=3,
        )
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
        assert got["0"] > got["1"] > got["2"] == got["3"]


class TestHarmonicCentrality:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src long, dst long")

    def test_hand_graph(self, spark):
        from cloud_crawler_spark.operators.graph import harmonic_centrality

        # 0->1->2->3->4 chain plus 0->2 shortcut
        e = self._edges(
            spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)]
        )
        got = {
            r["dst"]: (r["n_reaching"], r["harmonic"])
            for r in harmonic_centrality(e, max_depth=3).collect()
        }
        # 1: only 0 at d1. 2: 0 at d1 (shortcut wins over d2), 1 at d1.
        # 3: 2@1, 0@2 (via shortcut), 1@2. 4: 3@1, 2@2, 0@3, 1@3.
        assert got[1] == (1, 1.0)
        assert got[2] == (2, 2.0)
        assert got[3] == (3, 1.0 + 0.5 + 0.5)
        assert got[4][0] == 4
        assert abs(got[4][1] - (1.0 + 0.5 + 1 / 3 + 1 / 3)) < 1e-12
        assert 0 not in got  # nothing reaches the root

    def test_radius_bounds_reach(self, spark):
        from cloud_crawler_spark.operators.graph import harmonic_centrality

        e = self._edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
        got = {
            r["dst"]: r["n_reaching"]
            for r in harmonic_centrality(e, max_depth=2).collect()
        }
        assert got == {1: 1, 2: 2, 3: 2, 4: 2}  # d<=2 only

    def test_cycle_excludes_self(self, spark):
        from cloud_crawler_spark.operators.graph import harmonic_centrality

        e = self._edges(spark, [(0, 1), (1, 0)])
        got = {
            r["dst"]: (r["n_reaching"], r["harmonic"])
            for r in harmonic_centrality(e, max_depth=3).collect()
        }
        # 0 reaches itself at d2 — excluded; each node scores only 1/1
        assert got == {0: (1, 1.0), 1: (1, 1.0)}


class TestOutlinkEntropy:
    def test_hand_counts(self, spark):
        import math

        from cloud_crawler_spark.operators.graph import outlink_entropy

        rows = (
            [("p", "a.com")] * 4
            + [("p", "b.com")] * 4
            + [("farm", "x.com")] * 8
        )
        e = spark.createDataFrame(rows, "src string, dst_host string")
        got = {
            r["src"]: (r["n_links"], r["n_hosts"], r["entropy"])
            for r in outlink_entropy(e).collect()
        }
        assert got["p"][:2] == (8, 2)
        assert abs(got["p"][2] - math.log(2)) < 1e-12  # 50/50 split
        assert got["farm"] == (8, 1, 0.0)  # link farm: zero entropy


class TestGraphScorecard:
    def test_hand_graph(self, spark):
        import math

        from cloud_crawler_spark.operators.graph import graph_scorecard

        # 0<->1 reciprocal pair, 2->0, 3->0, dup edge collapses
        e = spark.createDataFrame(
            [(0, 1), (1, 0), (2, 0), (3, 0), (3, 0)], "src long, dst long"
        )
        row = graph_scorecard(e).collect()[0]
        assert row["n_nodes"] == 4
        assert row["n_edges"] == 4
        assert abs(row["reciprocity"] - 0.5) < 1e-12  # 2 of 4 edges
        # in-degrees: 0 has 3, 1 has 1 -> alpha = 1 + 2/(ln6 + ln2)
        want = 1.0 + 2.0 / (math.log(3 / 0.5) + math.log(1 / 0.5))
        assert abs(row["alpha_in"] - want) < 1e-12

    def test_self_loop_counts_as_reciprocal(self, spark):
        from cloud_crawler_spark.operators.graph import graph_scorecard

        e = spark.createDataFrame([(0, 0), (0, 1)], "src long, dst long")
        row = graph_scorecard(e).collect()[0]
        assert row["n_nodes"] == 2 and row["n_edges"] == 2
        assert abs(row["reciprocity"] - 0.5) < 1e-12


class TestLabelPropagation:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src long, dst long")

    @staticmethod
    def _expected_lpa(edges, iterations):
        """Plain-python synchronous min-tie-break LPA."""
        und = set()
        for s_, d_ in edges:
            if s_ != d_:
                und.add((s_, d_))
                und.add((d_, s_))
        nodes = sorted({u for u, _ in und})
        lbl = {u: u for u in nodes}
        for _ in range(iterations):
            new = {}
            for v in nodes:
                votes = {}
                for u, w in und:
                    if w == v:
                        votes[lbl[u]] = votes.get(lbl[u], 0) + 1
                if votes:
                    best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                    new[v] = best[0]
                else:
                    new[v] = lbl[v]
            lbl = new
        return lbl

    def test_matches_reference_on_bridged_cliques(self, spark):
        from cloud_crawler_spark.operators.graph import label_propagation

        rows = [(0, 1), (1, 2), (0, 2),
                (10, 11), (11, 12), (10, 12), (2, 10)]
        for it in (1, 2, 3, 4):
            got = {
                r["id"]: r["community"]
                for r in label_propagation(
                    self._edges(spark, rows), iterations=it
                ).collect()
            }
            assert got == self._expected_lpa(rows, it), it

    def test_clean_cliques_converge_to_min_label(self, spark):
        from cloud_crawler_spark.operators.graph import label_propagation

        # two 4-cliques, NO bridge: each converges to its min label
        def clique(base):
            ids = [base + i for i in range(4)]
            return [(a, b) for a in ids for b in ids if a < b]

        got = {
            r["id"]: r["community"]
            for r in label_propagation(
                self._edges(spark, clique(0) + clique(20)), iterations=4
            ).collect()
        }
        assert {got[i] for i in range(4)} == {0}
        assert {got[20 + i] for i in range(4)} == {20}

    def test_selfloop_dropped_direction_ignored(self, spark):
        from cloud_crawler_spark.operators.graph import label_propagation

        rows = [(5, 3), (3, 3)]
        got = {
            r["id"]: r["community"]
            for r in label_propagation(
                self._edges(spark, rows), iterations=2
            ).collect()
        }
        # the 2-node graph oscillates under sync LPA: after an EVEN
        # round count each node is back to its own label
        assert got == self._expected_lpa(rows, 2) == {3: 3, 5: 5}


class TestHyperballHarmonic:
    def test_tracks_exact_harmonic(self, spark):
        from cloud_crawler_spark.operators.graph import (
            harmonic_centrality,
            hyperball_harmonic,
        )

        # ring of 60 + star into node 0: node 0's in-ball dominates
        rows = [(i, (i + 1) % 60) for i in range(60)]
        rows += [(100 + i, 0) for i in range(40)]
        e = spark.createDataFrame(rows, "src long, dst long")
        exact = {r["dst"]: r["harmonic"]
                 for r in harmonic_centrality(e, max_depth=3).collect()}
        est = {r["id"]: r["harmonic_est"]
               for r in hyperball_harmonic(e, max_depth=3, p=6).collect()}
        # node 0 (43 in-ball) must clearly outrank a plain ring node
        assert est[0] > 2 * est[5]
        # HLL error ~13% at p=6; allow 40% slack on the big score
        assert abs(est[0] - exact[0]) / exact[0] < 0.4
        # nodes 1 and 2 sit downstream of the star hub within radius 3
        # (star->0->1->2), so only 3..59 are plain ring nodes with the
        # same exact score: their estimates must sit in a tight band
        assert est[1] > est[3] and est[2] > est[3]
        ring = [est[i] for i in range(3, 60)]
        assert min(ring) > 0
        assert max(ring) / min(ring) < 3.0

    def test_deterministic(self, spark):
        from cloud_crawler_spark.operators.graph import hyperball_harmonic

        e = spark.createDataFrame(
            [(i, (i * 3 + 1) % 20) for i in range(20)], "src long, dst long"
        )
        a = sorted(map(tuple, hyperball_harmonic(e, 2, p=5).collect()))
        b = sorted(map(tuple, hyperball_harmonic(e, 2, p=5).collect()))
        assert a == b

    def test_empty_ball_nodes_score_zero(self, spark):
        from cloud_crawler_spark.operators.graph import hyperball_harmonic

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        got = {r["id"]: r["harmonic_est"]
               for r in hyperball_harmonic(e, 2, p=4).collect()}
        assert got[0] == 0.0  # nothing reaches 0
        assert got[1] > 0.0


# --- triangles / local clustering (operators/graph.triangles) --------


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def test_triangles_k4(spark):
    from cloud_crawler_spark.operators.graph import triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    rows = {r["id"]: r for r in triangles(_edges_df(spark, k4)).collect()}
    assert len(rows) == 4
    for i in range(4):
        assert rows[i]["deg"] == 3
        assert rows[i]["tri"] == 3  # every node sits in C(3,2) = 3 triangles
        assert rows[i]["lcc"] == 1.0


def test_triangles_star_and_direction_invariance(spark):
    from cloud_crawler_spark.operators.graph import triangles

    # star: no triangles; duplicates / reversed edges / self-loops
    # must not change anything
    star = [(0, i) for i in range(1, 5)]
    noisy = star + [(i, 0) for i in range(1, 5)] + [(0, 0), (0, 1)]
    got = {r["id"]: r for r in triangles(_edges_df(spark, noisy)).collect()}
    assert got[0]["deg"] == 4 and got[0]["tri"] == 0 and got[0]["lcc"] == 0.0
    for i in range(1, 5):
        assert got[i]["deg"] == 1 and got[i]["tri"] == 0 and got[i]["lcc"] == 0.0


def test_triangles_hub_pivot_stays_small(spark):
    from cloud_crawler_spark.operators.graph import triangles

    # hub 0 connected to 20 leaves, one triangle hanging off it
    edges = [(0, i) for i in range(1, 21)] + [(1, 2)]
    got = {r["id"]: (r["tri"], r["lcc"]) for r in
           triangles(_edges_df(spark, edges)).collect()}
    assert got[0] == (1, 2.0 * 1 / (20 * 19))
    assert got[1] == (1, 1.0) and got[2] == (1, 1.0)
    assert got[3] == (0, 0.0)


def test_assortativity_star_is_minus_one(spark):
    from cloud_crawler_spark.operators.graph import assortativity

    star = [(0, i) for i in range(1, 4)]
    row = assortativity(_edges_df(spark, star)).collect()[0]
    assert row["n_edges"] == 3
    assert row["r"] == -1.0


def test_kcore_triangle_with_tail(spark):
    from cloud_crawler_spark.operators.graph import kcore

    # triangle 0-1-2 with a 3-chain tail hanging off node 0
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 5)]
    got = {r["id"]: r["deg"] for r in kcore(_edges_df(spark, edges), k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}  # tail peels over 3 rounds


def test_kcore_raises_when_not_converged(spark):
    import pytest as _pt
    from cloud_crawler_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(6)]
    with _pt.raises(RuntimeError, match="did not converge"):
        kcore(_edges_df(spark, chain), k=2, max_rounds=2)


def test_bowtie_classification(spark):
    from cloud_crawler_spark.operators.graph import bowtie

    # SCC {0,1}: 0<->1; IN: 2->0; OUT: 1->3; tendril off IN: 2->4;
    # disconnected pair 5->6
    edges = [(0, 1), (1, 0), (2, 0), (1, 3), (2, 4), (5, 6)]
    got = {r["id"]: r["component"] for r in
           bowtie(_edges_df(spark, edges), seed=0, radius=5).collect()}
    assert got == {0: "CORE", 1: "CORE", 2: "IN", 3: "OUT",
                   4: "OTHER", 5: "OTHER", 6: "OTHER"}  # 4 = tendril off IN


class TestPagerankWarmStart:
    """pagerank_on_edges(init_ranks=...) — the incremental
    (delta-crawl) recompute path."""

    def _ids(self, spark, ids):
        return spark.createDataFrame([(i,) for i in ids], "id long")

    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def test_fixpoint_is_stable_under_warm_start(self, spark):
        from cloud_crawler_spark.operators.graph import pagerank_on_edges

        # symmetric 2-cycle: the PageRank fixpoint is exactly uniform
        ids = self._ids(spark, [0, 1])
        edges = self._edges(spark, [(0, 1), (1, 0)])
        init = spark.createDataFrame(
            [(0, 0.5), (1, 0.5)], "canon_url long, rank double"
        )
        out = {
            r["canon_url"]: r["rank"]
            for r in pagerank_on_edges(ids, edges, iterations=1,
                                       init_ranks=init).collect()
        }
        assert out == {0: 0.5, 1: 0.5}

    def test_uniform_warm_start_equals_cold(self, spark):
        from cloud_crawler_spark.operators.graph import pagerank_on_edges

        ids = self._ids(spark, range(6))
        edges = self._edges(
            spark, [(i, (3 * i + 1) % 6) for i in range(6)]
            + [(i, (i + 2) % 6) for i in range(6)]
        )
        cold = {
            r["canon_url"]: round(r["rank"], 12)
            for r in pagerank_on_edges(ids, edges, iterations=2).collect()
        }
        init = spark.createDataFrame(
            [(i, 1.0 / 6) for i in range(6)], "canon_url long, rank double"
        )
        warm = {
            r["canon_url"]: round(r["rank"], 12)
            for r in pagerank_on_edges(ids, edges, iterations=2,
                                       init_ranks=init).collect()
        }
        assert warm == cold

    def test_stale_vector_renormalized_and_missing_ids_filled(self, spark):
        from cloud_crawler_spark.operators.graph import pagerank_on_edges

        ids = self._ids(spark, [0, 1, 2])
        edges = self._edges(spark, [(0, 1), (1, 2), (2, 0)])
        # stale vector: wrong scale (sums to 30), node 2 missing
        init = spark.createDataFrame(
            [(0, 20.0), (1, 10.0)], "canon_url long, rank double"
        )
        out = pagerank_on_edges(ids, edges, iterations=1, init_ranks=init)
        total = sum(r["rank"] for r in out.collect())
        assert abs(total - 1.0) < 1e-9  # mass invariant restored
