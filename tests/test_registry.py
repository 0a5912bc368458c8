"""Driver-contract registry invariants (no Spark session needed).

The external correctness gate consumes queries()/oracle_sql() blind —
these invariants are the repo-side guarantees it relies on:
every query has a same-named oracle, the documented sample rotation
is exactly the 50-entry prefix it claims to be, and the rotation
completes full driver coverage of the registry across the committed
per-round artifacts (VERDICT r4 task 3 'done' criterion).
"""

import json
import os

import __spark_entry__ as entrymod
from cloud_crawler_spark import queries as qmod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_and_oracles_in_sync():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(qs) == set(os_), "every query needs a same-named oracle"
    assert all(callable(f) for f in qs.values())
    # 145/145 oracle-backed (q_bpe_merges' unrolled oracle included):
    # no None/empty oracles — the driver's weaker rows-only check is
    # never triggered
    assert all(isinstance(s, str) and s.strip() for s in os_.values())
    # iteration order identical between the two dicts (the driver
    # samples a prefix of each)
    assert list(qs) == list(os_)


def test_sample_rotation_is_the_prefix():
    front = qmod._SAMPLE_FRONT
    assert len(front) == 50
    assert len(set(front)) == 50, "rotation entries must be unique"
    order = list(entrymod.queries())
    assert order[:50] == front, "rotation must be the iteration prefix"
    assert set(front) <= set(order), "rotation names must be registered"


def test_rotation_completes_driver_coverage():
    """Union of the committed driver artifacts (r01-r04) and the
    current 50-entry prefix must cover the ENTIRE registry — after
    the round-5 gate samples the prefix, every query has appeared in
    at least one independent driver CORRECTNESS artifact."""
    sampled = set()
    for r in (1, 2, 3, 4):
        path = os.path.join(REPO, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                sampled |= set(json.load(f))
    order = list(entrymod.queries())
    covered = sampled | set(order[:50])
    missing = set(order) - covered
    assert not missing, f"never driver-sampled even after r5: {missing}"


def test_crawl_corpus_requires_variant_for_robots():
    """A robots DataFrame is not part of the memo key, so supplying
    one without a unique variant would silently serve another
    variant's robots-less corpus — the guard must reject it before
    touching the cache."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="variant"):
        qmod._crawl_corpus(object(), "/tmp/nowhere", robots=object())
