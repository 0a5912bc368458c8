"""Named twin of the reference's child-spawning batch-job spec
(spec/child_spawning_batch_job_spec.rb:29-50 over
spec/child_spawning_batch_job.rb:44-70 make_children): a job whose
processing spawns n children per job until depth m, children linked to
their parent, total descendants = sum(n^i, i=1..m).

In this engine "jobs spawning jobs" IS the frontier expansion: each
round's processed rows emit their children into the next round's
frontier (plans/round.py _expand_links), bounded by depth_limit (F5),
with parent linkage carried as referer (J6) and per-round batch
accounting in the stats/lineage counters (the reference's
m_cache.incr num_batches / num_jobs, child_spawning_batch_job.rb:37-48,
maps to after_round + lineage)."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from tests.helpers import make_corpus, make_seeds

N, M = 3, 3  # n children per job, max depth


def _spawn_graph():
    """Ternary tree as a corpus: node '' (root) -> '0','1','2'; each
    node ID is its path digits, children append a digit. Depth in the
    graph == len(id)."""
    graph = {"root": {"links": [f"c{i}" for i in range(N)]}}
    frontier = [f"c{i}" for i in range(N)]
    while frontier:
        node = frontier.pop()
        if len(node) - 1 >= M:  # "cXYZ" -> depth = len-1
            continue
        kids = [node + str(i) for i in range(N)]
        graph[node] = {"links": kids}
        if len(node) < M:  # only spawn below the depth bound
            frontier.extend(kids)
    return graph


def test_child_spawning_counts_and_linkage(spark):
    graph = _spawn_graph()
    corpus = make_corpus(spark, graph)
    seeds = make_seeds(spark, ["http://www.example.com/root"])

    batches = []
    cfg = CrawlConfig(
        depth_limit=M,
        # num_batches accounting (process_batch m_cache.incr): one
        # entry per round with that round's job count
        after_round=lambda rnd, crawled: batches.append(
            (rnd, crawled.count())
        ),
    )
    res = crawl(spark, corpus, seeds, cfg)
    rows = res.crawled.select("url", "depth", "referer").collect()

    # "should create the correct number of child jobs":
    # sum(n^i, i=1..m) descendants (+1 for the seed root)
    num = sum(N ** i for i in range(1, M + 1))
    assert len(rows) == num + 1
    # "hashes with depth <= m and prev linked in"
    by_url = {r["url"]: r for r in rows}
    for r in rows:
        assert r["depth"] <= M
        if r["depth"] == 0:
            assert r["referer"] is None
        else:
            # prev hsh linked in: referer resolves to a crawled parent
            # one level up
            assert r["referer"] in by_url
            assert by_url[r["referer"]]["depth"] == r["depth"] - 1

    # per-depth fan-out is exactly n^depth (BFS rounds == job waves)
    per_depth = {}
    for r in rows:
        per_depth[r["depth"]] = per_depth.get(r["depth"], 0) + 1
    assert per_depth == {d: N ** d for d in range(M + 1)}

    # the num_batches counter saw one batch per wave, num_jobs summing
    # to the total (reference increments per batch and per job)
    assert [n for _, n in batches] == [N ** d for d in range(M + 1)]
    assert sum(n for _, n in batches) == num + 1
