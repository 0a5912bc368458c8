"""Partitioned Bloom filter: no false negatives ever; false positives
bounded and resolved by the exact anti-join (redis_url_bloomfilter.rb
parity: approximate filter + exact store)."""

from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.operators.seen import (
    anti_join_seen,
    bloom_gate,
    bloom_maybe_seen,
    bloom_maybe_seen_cogroup,
    build_bloom_filters,
)

from tests.helpers import crawled_names, make_corpus, make_seeds


def _urls(spark, n, prefix="http://h"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), (F.col("id") % 37).cast("string"),
                 F.lit(".com/p"), F.col("id").cast("string")).alias("canon_url")
    )


def test_no_false_negatives(spark):
    seen = _urls(spark, 5000)
    filters = build_bloom_filters(seen, n_buckets=16, bits_per_key=10, num_hashes=7)
    probed = bloom_maybe_seen(seen, filters, n_buckets=16, num_hashes=7)
    # every inserted key must probe positive
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark):
    seen = _urls(spark, 5000)
    novel = _urls(spark, 5000, prefix="http://novel")
    filters = build_bloom_filters(seen, n_buckets=16, bits_per_key=10, num_hashes=7)
    probed = bloom_maybe_seen(novel, filters, n_buckets=16, num_hashes=7)
    fp = probed.where(F.col("maybe_seen")).count()
    # 10 bits/key, 7 hashes => theoretical ~0.8%; allow generous 3%
    assert fp / 5000 < 0.03


def test_bloom_plus_exact_equals_exact(spark):
    """Composite gate (bloom pre-filter + exact anti-join on the maybes)
    must equal the plain exact anti-join."""
    seen = _urls(spark, 2000)
    cands = _urls(spark, 3000)  # overlaps first 2000
    exact = {r[0] for r in anti_join_seen(cands, seen).collect()}

    filters = build_bloom_filters(seen, n_buckets=8)
    probed = bloom_maybe_seen(cands, filters, n_buckets=8)
    new = probed.where(~F.col("maybe_seen")).drop("maybe_seen", "url_hash")
    maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen", "url_hash")
    composite = {r[0] for r in new.unionByName(anti_join_seen(maybe, seen)).collect()}
    assert composite == exact


def test_cogroup_probe_matches_broadcast_probe(spark):
    """The collect-free cogroup probe returns the same maybe_seen bits
    as the broadcast probe on a multi-bucket seen set (filters stay a
    DataFrame — nothing bulk-collected to the driver)."""
    seen = _urls(spark, 2000)
    cands = _urls(spark, 3000)
    filters = build_bloom_filters(seen, n_buckets=8)
    via_bc = {
        (r["canon_url"], r["maybe_seen"])
        for r in bloom_maybe_seen(cands, filters, n_buckets=8).collect()
    }
    via_cg = {
        (r["canon_url"], r["maybe_seen"])
        for r in bloom_maybe_seen_cogroup(cands, filters, n_buckets=8).collect()
    }
    assert via_cg == via_bc


def test_bloom_gate_large_path_equals_exact(spark):
    """bloom_gate forced onto the cogroup (large) path must equal the
    plain exact anti-join."""
    seen = _urls(spark, 2000)
    cands = _urls(spark, 3000)
    exact = {r[0] for r in anti_join_seen(cands, seen).collect()}
    got = {
        r["canon_url"]
        for r in bloom_gate(cands, seen, n_buckets=8, broadcast_max_bytes=0).collect()
    }
    assert got == exact


def test_crawl_with_bloom_matches_exact(spark):
    """End-to-end: use_bloom=True produces the identical crawl."""
    graph = {"0": {"links": ["1", "2"]}, "1": {"links": ["0", "2", "3"]}, "2": {}, "3": {}}
    corpus = make_corpus(spark, graph)
    seeds = make_seeds(spark, ["http://www.example.com/0"])
    exact = crawl(spark, corpus, seeds, CrawlConfig(use_bloom=False))
    bloom = crawl(spark, corpus, seeds, CrawlConfig(use_bloom=True))
    assert crawled_names(exact) == crawled_names(bloom)
    assert exact.crawled.count() == bloom.crawled.count()
