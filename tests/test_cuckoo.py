"""Partitioned cuckoo-filter URL-seen set (operators/seen.py cuckoo_*).

The north rule's seen set is "bloom/cuckoo"; the cuckoo variant adds
DELETION (cuckoo_delete) for revisit policies — expiring URLs without
rebuilding filters over the rest of the seen set. Correctness contract
is the same as the Bloom path: no false negatives ever, false positives
resolved by the exact anti-join, crawl output byte-identical to the
exact path (reference parity anchor: redis_url_bloomfilter.rb:32-112 —
the reference's filter is also approximate with an exact store behind
it).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.operators.seen import (
    _cuckoo_build_table,
    _cuckoo_probe_table,
    anti_join_seen,
    build_cuckoo_filters,
    cuckoo_delete,
    cuckoo_gate,
    cuckoo_maybe_seen,
    cuckoo_maybe_seen_cogroup,
    with_url_hash,
)
from tests.helpers import crawled_names, make_corpus, make_seeds

_U = "http://www.example.com"


def _hashes(n, seed=7):
    rng = np.random.default_rng(seed)
    h1 = rng.integers(0, 2**63, size=n, dtype=np.int64).view(np.uint64)
    h2 = rng.integers(0, 2**63, size=n, dtype=np.int64).view(np.uint64)
    return h1, h2


# ------------------------------------------------------------ table core


class TestCuckooTable:
    def test_no_false_negatives(self):
        h1, h2 = _hashes(10_000)
        table, nb = _cuckoo_build_table(h1, h2)
        assert _cuckoo_probe_table(table, nb, h1, h2).all()

    def test_false_positive_rate_low(self):
        h1, h2 = _hashes(10_000)
        table, nb = _cuckoo_build_table(h1, h2)
        q1, q2 = _hashes(50_000, seed=99)
        fpr = _cuckoo_probe_table(table, nb, q1, q2).mean()
        # 16-bit fingerprints, 8 probed slots: expected ~8/2^16 ≈ 0.012%
        assert fpr < 0.005

    def test_deterministic_build(self):
        h1, h2 = _hashes(5_000)
        t1, nb1 = _cuckoo_build_table(h1, h2)
        t2, nb2 = _cuckoo_build_table(h1, h2)
        assert nb1 == nb2 and (t1 == t2).all()

    def test_load_factor_bounded(self):
        h1, h2 = _hashes(10_000)
        table, nb = _cuckoo_build_table(h1, h2)
        load = 10_000 / (nb * table.shape[1])
        assert load <= 0.84 + 1e-9

    def test_empty_and_single(self):
        h1, h2 = _hashes(0)
        table, nb = _cuckoo_build_table(h1, h2)
        assert (table == 0).all()
        h1, h2 = _hashes(1)
        table, nb = _cuckoo_build_table(h1, h2)
        assert _cuckoo_probe_table(table, nb, h1, h2).all()


# ------------------------------------------------------ dataframe layer


def _seen_df(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit(f"{_U}/seen/"), F.col("id").cast("string")).alias("canon_url")
    )


def _cand_df(spark, n_old=250, n_new=250):
    old = spark.range(n_old).select(
        F.concat(F.lit(f"{_U}/seen/"), F.col("id").cast("string")).alias("canon_url")
    )
    new = spark.range(n_new).select(
        F.concat(F.lit(f"{_U}/new/"), F.col("id").cast("string")).alias("canon_url")
    )
    return old.unionByName(new)


class TestCuckooFilters:
    def test_probe_no_false_negatives(self, spark):
        seen = _seen_df(spark)
        filters = build_cuckoo_filters(seen)
        probed = cuckoo_maybe_seen(_cand_df(spark), filters)
        missed = probed.where(
            F.col("canon_url").startswith(f"{_U}/seen/") & ~F.col("maybe_seen")
        ).count()
        assert missed == 0

    def test_cogroup_matches_broadcast(self, spark):
        seen = _seen_df(spark)
        filters = build_cuckoo_filters(seen).cache()
        cand = _cand_df(spark)
        a = sorted(
            map(tuple, cuckoo_maybe_seen(cand, filters)
                .select("canon_url", "maybe_seen").collect())
        )
        b = sorted(
            map(tuple, cuckoo_maybe_seen_cogroup(cand, filters)
                .select("canon_url", "maybe_seen").collect())
        )
        assert a == b and a

    @pytest.mark.parametrize("broadcast_max", [64 << 20, 0])
    def test_gate_equals_exact_anti_join(self, spark, broadcast_max):
        seen = _seen_df(spark)
        cand = _cand_df(spark)
        exact = sorted(
            r["canon_url"] for r in anti_join_seen(cand, seen).collect()
        )
        gated = sorted(
            r["canon_url"]
            for r in cuckoo_gate(cand, seen, broadcast_max_bytes=broadcast_max).collect()
        )
        assert gated == exact and len(exact) == 250

    def test_delete_then_probe_misses(self, spark):
        seen = _seen_df(spark)
        filters = build_cuckoo_filters(seen).cache()
        expired = seen.where(
            F.regexp_extract("canon_url", r"(\d+)$", 1).cast("int") % 5 == 0
        )
        updated = cuckoo_delete(filters, expired).cache()
        probed = cuckoo_maybe_seen(seen, updated)
        # deleted keys miss (distinct build => exactly one fp copy each;
        # a residual hit can only be a genuine fp collision with a
        # surviving key — none at this scale/seed)
        still_hit = probed.join(expired, "canon_url").where("maybe_seen").count()
        assert still_hit == 0
        # non-deleted keys: still NO false negatives
        kept_missed = (
            probed.join(expired, "canon_url", "left_anti").where("NOT maybe_seen").count()
        )
        assert kept_missed == 0
        # n_items bookkeeping: 100 removed
        tot = updated.agg(F.sum("n_items")).collect()[0][0]
        assert tot == 400

    def test_delete_untouched_buckets_pass_through(self, spark):
        seen = _seen_df(spark, 200)
        filters = build_cuckoo_filters(seen).cache()
        one = seen.limit(1)
        updated = cuckoo_delete(filters, one)
        before = {r["bucket"]: r["table"] for r in filters.collect()}
        after = {r["bucket"]: r["table"] for r in updated.collect()}
        assert set(after) == set(before)
        changed = [b for b in before if before[b] != after[b]]
        assert len(changed) <= 1  # only the deleted key's bucket differs


# ---------------------------------------------------- end-to-end crawl


class TestCuckooCrawl:
    @pytest.mark.parametrize("broadcast_max", [64 << 20, 0])
    def test_crawl_cuckoo_matches_exact(self, spark, broadcast_max):
        """use_cuckoo through a real multi-round crawl (both probe
        paths); output must be byte-identical to the exact anti-join
        crawl — the same contract TestBloomCogroupCrawl pins for
        Bloom."""
        graph = {"0": {"links": [str(i) for i in range(1, 9)]}} | {
            str(i): {"links": [str((i * 3) % 9)]} for i in range(1, 9)
        }
        corpus = make_corpus(spark, graph)
        seeds = make_seeds(spark, [f"{_U}/0"])
        seen0 = spark.createDataFrame(
            [(f"{_U}/{i}",) for i in (4, 5)], "canon_url string"
        )
        exact = crawl(
            spark, corpus, seeds,
            CrawlConfig(), initial_seen=seen0,
        )
        cuckoo = crawl(
            spark, corpus, seeds,
            CrawlConfig(use_cuckoo=True, bloom_broadcast_max_bytes=broadcast_max),
            initial_seen=seen0,
        )
        cols = ["canon_url", "code", "depth", "rank"]
        a = sorted(map(tuple, exact.crawled.select(*cols).collect()))
        b = sorted(map(tuple, cuckoo.crawled.select(*cols).collect()))
        assert a == b and a
        assert crawled_names(exact) == crawled_names(cuckoo)


def test_cuckoo_build_at_design_load_for_bucketed_keys():
    """Regression (r5 review): build groups always hold keys with
    h1 === bucket (mod n_buckets) — pmod(h1, 64) chose the bucket — so
    an i1 derived from h1's low bits had only nb/64 distinct values,
    every build failed at the 0.84 design load, and the table doubled
    to ~32 bits/key. With i1 from h2, bucket-constrained key groups
    must build at exactly the intended power-of-two size."""
    import numpy as np

    from cloud_crawler_spark.operators.seen import (
        _cuckoo_build_table,
        _cuckoo_table_size,
    )

    rng = np.random.default_rng(11)
    for n in (100, 1_000, 20_000):
        # h1 constrained exactly like a real per-bucket group
        h1 = (rng.integers(0, 2**58, n, dtype=np.uint64) << np.uint64(6)) | np.uint64(7)
        h2 = rng.integers(1, 2**63, n, dtype=np.uint64)
        table, nb = _cuckoo_build_table(h1, h2)
        assert nb == _cuckoo_table_size(n), (n, nb, _cuckoo_table_size(n))
        # and everything inserted is findable (no false negatives)
        from cloud_crawler_spark.operators.seen import _cuckoo_probe_table

        assert _cuckoo_probe_table(table, nb, h1, h2).all()


def test_expire_seen_with_nonmembers_keeps_no_false_negatives(spark):
    """cuckoo_delete's membership precondition, enforced by expire_seen
    (r5 review): an expiry batch full of URLs that were NEVER crawled
    must not strip colliding members' fingerprints. After expiring a
    mixed batch, every REMAINING member still probes maybe_seen=True
    (the no-false-negatives gate contract)."""
    from pyspark.sql import functions as F

    from cloud_crawler_spark.operators.seen import (
        build_cuckoo_filters,
        cuckoo_maybe_seen,
        expire_seen,
    )

    seen = spark.range(3000).select(
        F.concat(F.lit("http://h.com/s"), F.col("id").cast("string"))
        .alias("canon_url")
    )
    filters = build_cuckoo_filters(seen)
    # 100 true members + 30k never-seen URLs in one expiry batch
    expired = seen.limit(100).unionByName(
        spark.range(30_000).select(
            F.concat(F.lit("http://h.com/x"), F.col("id").cast("string"))
            .alias("canon_url")
        )
    )
    new_seen, new_filters = expire_seen(seen, expired, filters)
    remaining = new_seen.count()
    assert remaining == 2900
    probed = cuckoo_maybe_seen(new_seen, new_filters)
    assert probed.where(~F.col("maybe_seen")).count() == 0
