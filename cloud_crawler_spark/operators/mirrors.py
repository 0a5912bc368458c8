"""Mirror-site detection over a crawled corpus.

Web-scale crawls re-fetch the same content through mirrors, CDN
aliases, and parked duplicate domains; detecting host pairs that serve
largely identical content feeds both crawl scheduling (collapse the
frontier budget of a mirror onto its primary) and corpus dedup at the
HOST granularity — complementing the per-document operators in
operators/dedup.py. The reference crawls one seed domain at a time and
never sees this; it is a required op for Common-Crawl-style multi-host
corpora.

Scale shape: every step is keyed on the content fingerprint (pass an
8-byte ``xxhash64`` of the page text for the cheapest shuffle) or on a
host — all bucketed equi-joins / map-side-combinable groupBys, never
all-pairs over documents. The one quadratic hazard — a fingerprint
served by thousands of hosts (empty pages, soft-404 templates,
boilerplate) squaring inside the self-join — is removed by the
``max_hosts_per_key`` gate BEFORE the join: such keys are boilerplate,
not mirror signal, and are excluded from `n_shared` (host totals still
count them, keeping the Jaccard denominator honest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_pairs(
    df: DataFrame,
    host_col: str = "host",
    key_col: str = "content_key",
    min_shared: int = 2,
    max_hosts_per_key: int = 64,
) -> DataFrame:
    """Host pairs ranked by shared distinct content fingerprints.

    Returns (host_a, host_b, n_shared, n_a, n_b, jaccard) with
    host_a < host_b, n_shared >= min_shared; jaccard is the overlap of
    the two hosts' distinct-fingerprint sets, rounded to 6 digits so
    the value is engine-reproducible (q_mirror_hosts oracle).
    """
    hk = df.select(
        F.col(host_col).alias("host"), F.col(key_col).alias("k")
    ).distinct()
    per_host = hk.groupBy("host").agg(F.count("*").alias("n_keys"))
    # boilerplate gate: keys on too many hosts square inside the
    # self-join and carry no mirror signal
    keys_ok = (
        hk.groupBy("k")
        .agg(F.count("*").alias("_nh"))
        .where(F.col("_nh") <= max_hosts_per_key)
        .select("k")
    )
    hk_ok = hk.join(keys_ok, "k", "left_semi")
    a = hk_ok.select(F.col("host").alias("host_a"), "k")
    b = hk_ok.select(F.col("host").alias("host_b"), "k")
    pairs = (
        a.join(b, "k")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    na = per_host.select(F.col("host").alias("host_a"), F.col("n_keys").alias("n_a"))
    nb = per_host.select(F.col("host").alias("host_b"), F.col("n_keys").alias("n_b"))
    shared = F.col("n_shared")
    return (
        pairs.join(na, "host_a")
        .join(nb, "host_b")
        .select(
            "host_a",
            "host_b",
            shared.cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(shared / (F.col("n_a") + F.col("n_b") - shared), 6).alias(
                "jaccard"
            ),
        )
    )
