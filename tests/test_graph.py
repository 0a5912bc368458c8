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
