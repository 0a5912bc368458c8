"""FrontierStore BACKEND CONTRACT suite (VERDICT r4 task 5).

SURVEY §7 names the store an injection point: the Parquet+manifest
backend runs here, a real Iceberg catalog backend slots in on a
cluster. This suite makes that contract EXECUTABLE: every test drives
only the public store surface (commit_seed / commit_round /
committed_round / frontier / seen / crawled / lineage, plus the
capability-gated compact/docs extras) with schema-conformant
DataFrames — no Crawler, no filesystem peeking — so a future backend
passes it unchanged by adding one factory entry to BACKENDS.

Contract guarantees pinned:
  * seed commit initializes round -1 and resets prior state
  * commit_round advances the committed pointer atomically; readers
    union exactly the committed rounds
  * snapshot reads are time-travelable (upto=k) and IMMUTABLE under
    later commits — both re-issued reads and already-built reader
    DataFrames (concurrent-reader visibility)
  * re-committing a round replaces it (crash-retry idempotence)
  * re-seeding starts a fresh crawl: old rounds invisible
  * [capability: compaction] compact() is read-invariant at every
    time-travel point, across generations
  * [capability: docs] the JSON doc store rounds union like the rest

The sibling crash/orphan-file tests (filesystem-level atomicity of the
local backend) stay in tests/test_store_resume.py — they poke paths,
which is backend-specific by nature.
"""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.sources.store import (
    FRONTIER_SCHEMA,
    LINEAGE_SCHEMA,
    SEEN_SCHEMA,
    FrontierStore,
    IcebergFrontierStore,
)


# ------------------------------------------------------------ backends

def _parquet_backend(spark, tmp_path):
    return {
        "store": FrontierStore(spark, str(tmp_path / "store")),
        "reopen": lambda: FrontierStore(spark, str(tmp_path / "store")),
        "compaction": True,
        "docs": True,
    }


def _iceberg_backend(spark, tmp_path):
    try:
        store = IcebergFrontierStore(spark, catalog="contracttest")
    except RuntimeError as exc:  # no runtime jar in this sandbox
        pytest.skip(f"iceberg backend unavailable: {exc}")
    return {
        "store": store,
        "reopen": lambda: IcebergFrontierStore(spark, catalog="contracttest"),
        "compaction": False,  # Iceberg compacts via rewrite_data_files
        "docs": False,
    }


BACKENDS = {"parquet": _parquet_backend, "iceberg": _iceberg_backend}


@pytest.fixture(params=sorted(BACKENDS))
def backend(request, spark, tmp_path):
    return BACKENDS[request.param](spark, tmp_path)


# ------------------------------------------------------ data factories

def _frontier(spark, ids, rnd, status="pending"):
    rows = [
        (
            f"http://ex.com/p{i}", f"http://ex.com/p{i}", "ex.com",
            0, None, 0.0, rnd, status, int(i), 0,
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def _seen(spark, ids):
    return spark.createDataFrame(
        [(f"http://ex.com/p{i}",) for i in ids], SEEN_SCHEMA
    )


_CRAWLED_SCHEMA = "canon_url string, round int, rank long, depth int, text string"


def _crawled(spark, ids, rnd):
    rows = [(f"http://ex.com/p{i}", rnd, int(i), 0, f"text {i}") for i in ids]
    return spark.createDataFrame(rows, _CRAWLED_SCHEMA)


def _lineage(spark, rnd, fetched):
    return spark.createDataFrame(
        [(rnd, 0, fetched, 0, 0, 0)], LINEAGE_SCHEMA
    )


def _commit(spark, store, rnd, ids, new=None):
    # `new` = the newly-seen delta; deltas are DISJOINT across rounds
    # by caller contract (the crawler's seen gate guarantees it), so a
    # round that re-fetches already-seen URLs passes new=[]
    store.commit_round(
        rnd,
        crawled=_crawled(spark, ids, rnd),
        newly_seen=_seen(spark, ids if new is None else new),
        frontier=_frontier(spark, [max(ids) + 1], rnd),
        lineage=_lineage(spark, rnd, len(ids)),
        stats={"next_rank": max(ids) + 1},
    )


def _urls(df, col="canon_url"):
    return sorted(r[col] for r in df.select(col).collect())


def _u(ids):
    return sorted(f"http://ex.com/p{i}" for i in ids)


# ------------------------------------------------------------ contract

def test_seed_initializes_round_minus_one(backend, spark):
    store = backend["store"]
    store.commit_seed(_frontier(spark, [0, 1], -1), _seen(spark, [0, 1]))
    assert store.committed_round() == -1
    assert _urls(store.frontier()) == _u([0, 1])
    assert _urls(store.seen()) == _u([0, 1])
    with pytest.raises(Exception):
        store.crawled().collect()  # no crawl rounds yet


def test_commit_round_advances_and_unions(backend, spark):
    store = backend["store"]
    store.commit_seed(_frontier(spark, [0], -1), _seen(spark, [0]))
    _commit(spark, store, 0, [0], new=[])
    _commit(spark, store, 1, [1, 2])
    _commit(spark, store, 2, [3])
    assert store.committed_round() == 2
    assert _urls(store.crawled()) == _u([0, 1, 2, 3])
    assert _urls(store.seen()) == _u([0, 1, 2, 3])
    # frontier() is the LAST snapshot, not a union
    assert _urls(store.frontier()) == _u([4])
    # lineage has one entry per crawl round
    rounds = sorted(
        r["round"] for r in store.lineage().select("round").collect()
    )
    assert rounds == [0, 1, 2]
    assert store.lineage().columns == LINEAGE_SCHEMA.replace(" long", "") \
        .replace(" int", "").split(", ")


def test_time_travel_immutable_under_later_commits(backend, spark):
    store = backend["store"]
    store.commit_seed(_frontier(spark, [0], -1), _seen(spark, [0]))
    _commit(spark, store, 0, [0], new=[])
    _commit(spark, store, 1, [1])
    # pin snapshot readers BEFORE further commits (concurrent reader)
    seen_at_1 = store.seen()
    crawled_at_1 = store.crawled()
    frontier_at_1 = store.frontier()
    want_seen, want_crawled = _urls(seen_at_1), _urls(crawled_at_1)
    want_frontier = _urls(frontier_at_1)

    _commit(spark, store, 2, [2])
    _commit(spark, store, 3, [3])

    # re-issued time-travel reads see exactly rounds <= k
    assert _urls(store.seen(upto=1)) == _u([0, 1])
    assert _urls(store.crawled(upto=1)) == _u([0, 1])
    assert _urls(store.frontier(rnd=1)) == want_frontier
    # the pinned reader DataFrames still serve their snapshot
    assert _urls(seen_at_1) == want_seen
    assert _urls(crawled_at_1) == want_crawled


def test_recommit_round_replaces(backend, spark):
    """Crash-retry idempotence: re-committing round k (e.g. a resumed
    driver redoing the round that never flipped the manifest) must
    REPLACE round k's tables, never double them."""
    store = backend["store"]
    store.commit_seed(_frontier(spark, [0], -1), _seen(spark, [0]))
    _commit(spark, store, 0, [0], new=[])
    _commit(spark, store, 1, [1, 2])
    _commit(spark, store, 1, [7, 8])  # retry with different outcome
    assert store.committed_round() == 1
    assert _urls(store.crawled()) == _u([0, 7, 8])
    assert _urls(store.seen()) == _u([0, 7, 8])


def test_reseed_starts_fresh(backend, spark):
    store = backend["store"]
    store.commit_seed(_frontier(spark, [0], -1), _seen(spark, [0]))
    _commit(spark, store, 0, [0], new=[])
    _commit(spark, store, 1, [1])
    store.commit_seed(_frontier(spark, [9], -1), _seen(spark, [9]))
    assert store.committed_round() == -1
    assert _urls(store.seen()) == _u([9])
    assert _urls(store.frontier()) == _u([9])
    with pytest.raises(Exception):
        store.crawled().collect()
    # the fresh crawl's round 0 replaces the old crawl's
    _commit(spark, store, 0, [9], new=[])
    assert _urls(store.crawled()) == _u([9])


def test_reopen_sees_committed_state(backend, spark):
    """A fresh store handle over the same backing state (a resumed
    driver) reads exactly what was committed."""
    store = backend["store"]
    store.commit_seed(_frontier(spark, [0], -1), _seen(spark, [0]))
    _commit(spark, store, 0, [0], new=[])
    _commit(spark, store, 1, [1])
    store2 = backend["reopen"]()
    assert store2.committed_round() == 1
    assert _urls(store2.crawled()) == _u([0, 1])
    assert _urls(store2.seen()) == _u([0, 1])


def test_compaction_is_read_invariant(backend, spark):
    if not backend["compaction"]:
        pytest.skip("backend compacts externally (e.g. Iceberg rewrite)")
    store = backend["store"]
    store.commit_seed(_frontier(spark, [0], -1), _seen(spark, [0]))
    for rnd, ids in enumerate([[0], [1, 2], [3]]):
        _commit(spark, store, rnd, ids, new=[] if rnd == 0 else None)
    snapshots = {
        k: (_urls(store.seen(upto=k)), _urls(store.crawled(upto=k)))
        for k in range(3)
    }
    lineage_before = sorted(map(tuple, store.lineage().collect()))

    info = store.compact()
    assert info["upto"] == 2
    for k, (s, c) in snapshots.items():
        assert _urls(store.seen(upto=k)) == s, f"seen upto={k}"
        assert _urls(store.crawled(upto=k)) == c, f"crawled upto={k}"
    assert sorted(map(tuple, store.lineage().collect())) == lineage_before

    # next generation: more rounds, compact again, still invariant
    _commit(spark, store, 3, [4, 5])
    info2 = store.compact()
    assert info2["gen"] == info["gen"] + 1
    assert _urls(store.crawled()) == _u([0, 1, 2, 3, 4, 5])
    for k, (s, c) in snapshots.items():
        assert _urls(store.seen(upto=k)) == s
        assert _urls(store.crawled(upto=k)) == c


def test_docs_union_rounds(backend, spark):
    if not backend["docs"]:
        pytest.skip("backend has no JSON doc store")
    store = backend["store"]
    store.commit_seed(_frontier(spark, [0], -1), _seen(spark, [0]))
    _commit(spark, store, 0, [0], new=[])
    docs0 = spark.createDataFrame(
        [("http://ex.com/p0", "zero", 1)], "canon_url string, body string, k int"
    )
    store.commit_docs(0, docs0)
    _commit(spark, store, 1, [1])
    store.commit_docs(1, spark.createDataFrame(
        [("http://ex.com/p1", "one", 2)], "canon_url string, body string, k int"
    ))
    got = {r["canon_url"]: r["doc_json"] for r in store.docs().collect()}
    assert set(got) == set(_u([0, 1]))
    assert '"body":"zero"' in got["http://ex.com/p0"]
    # time travel on docs
    assert set(
        r["canon_url"] for r in store.docs(upto=0).collect()
    ) == set(_u([0]))
