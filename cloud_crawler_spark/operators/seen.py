"""URL-seen set: exact anti-join plus a partitioned Bloom filter.

Reference: RedisUrlBloomfilter (redis_url_bloomfilter.rb:32-112) — a
single shared Redis bit array (500k bits, 7 hashes). A single shared
filter cannot work at a 10^10-URL frontier; here the seen set is:

* an exact, append-only `seen(canon_url, url_hash)` table — the ground
  truth, probed with a LEFT ANTI join on `url_hash` (a cheap 8-byte
  shuffle key instead of the full URL string);
* a *partitioned* Bloom filter: one filter per host-bucket, built as a
  binary column via applyInPandas over numpy bit arrays, probed with an
  Arrow-batched UDF against the (broadcast) bucket->filter map. At
  scale the Bloom probe pre-filters the anti-join so the shuffle only
  carries potential duplicates; false positives are resolved by the
  exact join, false negatives are impossible.

Like the reference (whose Bloom is also approximate), the exact table
remains the correctness oracle; the Bloom path is a scale optimization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType as _BooleanType

HASH_SEED = 42  # fixed (reference pins seed 1364249661 for determinism)


def with_url_hash(df: DataFrame, canon_col: str = "canon_url") -> DataFrame:
    """64-bit URL identity hash (JVM-side xxhash64 — no Python)."""
    h1 = F.xxhash64(F.col(canon_col))
    h2 = F.xxhash64(F.col(canon_col), F.lit(HASH_SEED))
    return df.withColumn("url_hash", h1).withColumn("url_hash2", h2)


def anti_join_seen(candidates: DataFrame, seen: DataFrame | None, canon_col: str = "canon_url") -> DataFrame:
    """Exact not-visited gate (F6/D2): LEFT ANTI on canon_url."""
    if seen is None or len(seen.columns) == 0:
        return candidates
    # anti-join semantics don't need a distinct build side
    return candidates.join(
        seen.select(F.col(canon_col)), on=canon_col, how="left_anti"
    )


# ------------------------------------------------------ partitioned Bloom


def _bloom_params(n_items: int, bits_per_key: int):
    m = max(64, int(n_items) * bits_per_key)
    m = (m + 7) // 8 * 8  # byte-align
    return m


def build_bloom_filters(
    seen: DataFrame,
    n_buckets: int = 64,
    bits_per_key: int = 10,
    num_hashes: int = 7,
    canon_col: str = "canon_url",
) -> DataFrame:
    """Build one Bloom filter per host-bucket.

    Returns DataFrame(bucket INT, filter BINARY, n_items LONG, m_bits LONG).
    Hash indexes use double hashing: idx_i = (h1 + i*h2) mod m, with
    h1/h2 = xxhash64(canon_url[, seed]) computed JVM-side.
    """
    hashed = with_url_hash(seen.select(canon_col).distinct(), canon_col).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )

    def make_filter(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        m = _bloom_params(n, bits_per_key)
        bits = np.zeros(m // 8, dtype=np.uint8)
        # probe base = h2 (independent of the bucket id, which is h1 mod
        # n_buckets — using h1 as base would constrain positions to a
        # 1/n_buckets slice); step forced odd so it is coprime with the
        # byte-aligned (even) m and the probe sequence doesn't degenerate
        h2 = pdf["url_hash2"].to_numpy(dtype=np.int64).view(np.uint64)
        step = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64) | np.uint64(1)
        for i in range(num_hashes):
            idx = (h2 + np.uint64(i) * step) % np.uint64(m)
            np.bitwise_or.at(bits, (idx // 8).astype(np.int64), (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0]) if n else 0],
                "filter": [bits.tobytes()],
                "n_items": [n],
                "m_bits": [m],
            }
        )

    return hashed.groupBy("bucket").applyInPandas(
        make_filter, "bucket int, filter binary, n_items long, m_bits long"
    )


def bloom_maybe_seen(
    candidates: DataFrame,
    filters: DataFrame,
    n_buckets: int = 64,
    num_hashes: int = 7,
    canon_col: str = "canon_url",
) -> DataFrame:
    """Attach `maybe_seen` BOOLEAN via broadcast bucket->filter probe.

    Rows with maybe_seen=false are DEFINITELY new (no false negatives)
    and can skip the exact anti-join shuffle entirely.
    """
    fmap = {r["bucket"]: (r["filter"], r["m_bits"]) for r in filters.collect()}
    bc = candidates.sparkSession.sparkContext.broadcast(fmap)

    @pandas_udf(_BooleanType())
    def probe(bucket: pd.Series, h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        local = bc.value
        out = np.zeros(len(bucket), dtype=bool)
        b = bucket.to_numpy()
        h2 = h2s.to_numpy(dtype=np.int64).view(np.uint64)
        step = h1s.to_numpy(dtype=np.int64).view(np.uint64) | np.uint64(1)
        for bk in np.unique(b):
            ent = local.get(int(bk))
            if ent is None:
                continue
            blob, m = ent
            bits = np.frombuffer(blob, dtype=np.uint8)
            sel = b == bk
            hit = np.ones(sel.sum(), dtype=bool)
            for i in range(num_hashes):
                idx = (h2[sel] + np.uint64(i) * step[sel]) % np.uint64(m)
                hit &= (bits[(idx // 8).astype(np.int64)] & (1 << (idx % 8)).astype(np.uint8)) != 0
            out[sel] = hit
        return pd.Series(out)

    hashed = with_url_hash(candidates, canon_col).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    return hashed.withColumn(
        "maybe_seen", probe(F.col("bucket"), F.col("url_hash"), F.col("url_hash2"))
    ).drop("bucket", "url_hash2")


def bloom_maybe_seen_cogroup(
    candidates: DataFrame,
    filters: DataFrame,
    n_buckets: int = 64,
    num_hashes: int = 7,
    canon_col: str = "canon_url",
) -> DataFrame:
    """Collect-free Bloom probe: cogroup candidates with their bucket's
    filter row and probe executor-side.

    Same output contract as `bloom_maybe_seen` (candidate columns +
    url_hash + maybe_seen), but the filters STAY a DataFrame: each
    bucket's bit array is shipped once per cogroup task, never through
    the driver. This is the scale path — at the 10^10-URL design point
    with 10 bits/key the filter set is ~12 GB, which the broadcast path
    would pull into the driver (the round-1 scale-killer this replaces).
    """
    import pyspark.sql.types as T

    hashed = with_url_hash(candidates, canon_col).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    kept = [f for f in hashed.schema.fields if f.name not in ("bucket", "url_hash2")]
    out_schema = T.StructType(kept + [T.StructField("maybe_seen", T.BooleanType())])
    out_cols = [f.name for f in kept]

    def probe_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=out_cols + ["maybe_seen"])
        out = left[out_cols].copy()
        if len(right) == 0:
            out["maybe_seen"] = False
            return out
        blob, m = right["filter"].iloc[0], int(right["m_bits"].iloc[0])
        bits = np.frombuffer(blob, dtype=np.uint8)
        h2 = left["url_hash2"].to_numpy(dtype=np.int64).view(np.uint64)
        step = left["url_hash"].to_numpy(dtype=np.int64).view(np.uint64) | np.uint64(1)
        hit = np.ones(len(left), dtype=bool)
        for i in range(num_hashes):
            idx = (h2 + np.uint64(i) * step) % np.uint64(m)
            hit &= (bits[(idx // 8).astype(np.int64)] & (1 << (idx % 8)).astype(np.uint8)) != 0
        out["maybe_seen"] = hit
        return out

    return (
        hashed.groupBy("bucket")
        .cogroup(filters.groupBy("bucket"))
        .applyInPandas(probe_group, out_schema)
    )


def bloom_gate(
    candidates: DataFrame,
    seen: DataFrame,
    n_buckets: int = 64,
    bits_per_key: int = 10,
    num_hashes: int = 7,
    canon_col: str = "canon_url",
    broadcast_max_bytes: int = 64 << 20,
) -> DataFrame:
    """Full Bloom-accelerated not-visited gate: build partitioned
    filters from `seen`, probe candidates (broadcast for small filter
    sets, cogroup beyond `broadcast_max_bytes`), then resolve the
    maybe-seen residue with the exact anti-join. Output == the plain
    exact anti-join (no false negatives; false positives re-checked).
    """
    filters = build_bloom_filters(seen, n_buckets, bits_per_key, num_hashes, canon_col).cache()
    # one-row size probe — a driver-side aggregate, not a bulk collect
    total_bytes = (filters.agg((F.sum("m_bits") / 8).alias("b")).collect()[0]["b"]) or 0
    if total_bytes <= broadcast_max_bytes:
        probed = bloom_maybe_seen(candidates, filters, n_buckets, num_hashes, canon_col)
    else:
        probed = bloom_maybe_seen_cogroup(candidates, filters, n_buckets, num_hashes, canon_col)
    definitely_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen", "url_hash")
    maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen", "url_hash")
    return definitely_new.unionByName(anti_join_seen(maybe, seen, canon_col))
