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


# ------------------------------------------------------ partitioned cuckoo
#
# The north rule names "bloom/cuckoo URL-seen" — the cuckoo variant is
# the one that supports DELETION, which matters for revisit policies at
# the 10^10-URL design point: expiring 1% of the seen set for recrawl
# means a full Bloom rebuild (every bit is shared) but an in-place
# fingerprint removal for a cuckoo table. Layout per host-bucket: a
# (nb, slots) uint16 fingerprint table, nb a power of two, slots=4,
# targeting ~0.84 load (the classic (2,4)-cuckoo capacity ceiling).
# Partner bucket i2 = i1 XOR H(fp) — XOR makes the pair relation
# symmetric, so eviction never needs to know which index a resident
# fingerprint originally hashed to. ~16 bits/key at 10 bits-equivalent
# FPR ≈ 2*slots/2^16 ≈ 0.012%; deterministic build (eviction choices
# derived from a counter, not RNG) so identical inputs give identical
# filter bytes on every executor.


_CUCKOO_SLOTS = 4
_CUCKOO_MAX_KICKS = 500
_CUCKOO_LOAD = 0.84
_FP_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd (golden-ratio) mixer


def _cuckoo_fp(h2: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the high bits of h2 (the low
    bits of h1 already picked the host-bucket and i1)."""
    fp = (h2 >> np.uint64(48)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp).astype(np.uint16)


def _cuckoo_partner(i1: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    """i2 = i1 XOR H(fp) mod nb (nb power of two). Involution: applying
    it to i2 returns i1, so eviction re-homes without provenance."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the mix
        h = (fp.astype(np.uint64) * _FP_MIX) >> np.uint64(32)
    return (i1 ^ h) & np.uint64(nb - 1)


def _cuckoo_i1(h2: np.ndarray, nb: int) -> np.ndarray:
    """Primary index from h2's LOW bits (h1 already chose the
    host-bucket via pmod(h1, n_buckets), so h1-derived low bits are
    CONSTANT within a bucket's build group — using them for i1
    constrained the primary index to nb/n_buckets rows, every build
    failed at the 0.84 design load and doubled to 2x the intended
    size (~32 bits/key, verified numerically in the r5 review). The
    bloom builder avoids the same degeneracy the same way: h2 as the
    index base. fp uses h2's high 16 bits — disjoint bit range."""
    return h2 & np.uint64(nb - 1)


def _cuckoo_table_size(n: int, slots: int = _CUCKOO_SLOTS) -> int:
    nb = 1
    while nb * slots * _CUCKOO_LOAD < max(1, n):
        nb <<= 1
    return nb


def _cuckoo_build_table(h1: np.ndarray, h2: np.ndarray):
    """Build one cuckoo table; returns (table uint16[nb, slots], nb).

    Deterministic: eviction victim slot cycles with a per-insert kick
    counter; on a full-table failure the table doubles and rebuilds
    (bounded — at 0.84 target load failures are already rare, and each
    doubling halves the load)."""
    n = len(h1)
    nb = _cuckoo_table_size(n)
    fps = _cuckoo_fp(h2)
    while True:
        table = np.zeros((nb, _CUCKOO_SLOTS), dtype=np.uint16)
        i1s = _cuckoo_i1(h2, nb).astype(np.uint64)
        ok = True
        for k in range(n):
            fp = fps[k]
            i = int(i1s[k])
            j = int(_cuckoo_partner(np.uint64(i), np.uint16(fp), nb))
            placed = False
            for b in (i, j):
                row = table[b]
                empt = np.nonzero(row == 0)[0]
                if len(empt):
                    row[empt[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            # evict: alternate buckets, victim slot from the kick counter
            b = i
            cur = fp
            for kick in range(_CUCKOO_MAX_KICKS):
                s = kick % _CUCKOO_SLOTS
                cur, table[b][s] = table[b][s], cur
                b = int(_cuckoo_partner(np.uint64(b), np.uint16(cur), nb))
                row = table[b]
                empt = np.nonzero(row == 0)[0]
                if len(empt):
                    row[empt[0]] = cur
                    placed = True
                    break
            if not placed:
                ok = False
                break
        if ok:
            return table, nb
        nb <<= 1


def _cuckoo_probe_table(table: np.ndarray, nb: int, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized membership: fp present in row i1 or row i2."""
    fps = _cuckoo_fp(h2)
    i1 = _cuckoo_i1(h2, nb).astype(np.int64)
    i2 = _cuckoo_partner(i1.view(np.uint64), fps, nb).astype(np.int64)
    f = fps[:, None]
    return ((table[i1] == f).any(axis=1)) | ((table[i2] == f).any(axis=1))


CUCKOO_FILTER_SCHEMA = "bucket int, table binary, nb long, n_items long"


def build_cuckoo_filters(
    seen: DataFrame,
    n_buckets: int = 64,
    canon_col: str = "canon_url",
) -> DataFrame:
    """One cuckoo filter per host-bucket (the Bloom twin with delete
    support). Returns DataFrame(bucket, table BINARY, nb, n_items)."""
    hashed = with_url_hash(seen.select(canon_col).distinct(), canon_col).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )

    def make_filter(pdf: pd.DataFrame) -> pd.DataFrame:
        h1 = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        h2 = pdf["url_hash2"].to_numpy(dtype=np.int64).view(np.uint64)
        table, nb = _cuckoo_build_table(h1, h2)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0]) if len(pdf) else 0],
                "table": [table.tobytes()],
                "nb": [nb],
                "n_items": [len(pdf)],
            }
        )

    return hashed.groupBy("bucket").applyInPandas(make_filter, CUCKOO_FILTER_SCHEMA)


def cuckoo_maybe_seen(
    candidates: DataFrame,
    filters: DataFrame,
    n_buckets: int = 64,
    canon_col: str = "canon_url",
) -> DataFrame:
    """Broadcast bucket->table probe; contract mirrors bloom_maybe_seen
    (candidate cols + url_hash + maybe_seen; no false negatives)."""
    fmap = {r["bucket"]: (r["table"], r["nb"]) for r in filters.collect()}
    bc = candidates.sparkSession.sparkContext.broadcast(fmap)

    @pandas_udf(_BooleanType())
    def probe(bucket: pd.Series, h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        local = bc.value
        out = np.zeros(len(bucket), dtype=bool)
        b = bucket.to_numpy()
        h1 = h1s.to_numpy(dtype=np.int64).view(np.uint64)
        h2 = h2s.to_numpy(dtype=np.int64).view(np.uint64)
        for bk in np.unique(b):
            ent = local.get(int(bk))
            if ent is None:
                continue
            blob, nb = ent
            table = np.frombuffer(blob, dtype=np.uint16).reshape(-1, _CUCKOO_SLOTS)
            sel = b == bk
            out[sel] = _cuckoo_probe_table(table, int(nb), h1[sel], h2[sel])
        return pd.Series(out)

    hashed = with_url_hash(candidates, canon_col).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    return hashed.withColumn(
        "maybe_seen", probe(F.col("bucket"), F.col("url_hash"), F.col("url_hash2"))
    ).drop("bucket", "url_hash2")


def cuckoo_maybe_seen_cogroup(
    candidates: DataFrame,
    filters: DataFrame,
    n_buckets: int = 64,
    canon_col: str = "canon_url",
) -> DataFrame:
    """Collect-free probe: cogroup candidates with their bucket's table
    row — the 10^10-scale path (≈16 bits/key the filter set is ~20 GB;
    it must never transit the driver)."""
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
        blob, nb = right["table"].iloc[0], int(right["nb"].iloc[0])
        table = np.frombuffer(blob, dtype=np.uint16).reshape(-1, _CUCKOO_SLOTS)
        h1 = left["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        h2 = left["url_hash2"].to_numpy(dtype=np.int64).view(np.uint64)
        out["maybe_seen"] = _cuckoo_probe_table(table, nb, h1, h2)
        return out

    return (
        hashed.groupBy("bucket")
        .cogroup(filters.groupBy("bucket"))
        .applyInPandas(probe_group, out_schema)
    )


def cuckoo_delete(
    filters: DataFrame,
    urls: DataFrame,
    n_buckets: int = 64,
    canon_col: str = "canon_url",
) -> DataFrame:
    """Remove `urls` from the partitioned cuckoo filters IN PLACE (one
    fingerprint copy per key — exact when keys were distinct at build,
    which build_cuckoo_filters guarantees via its distinct()). This is
    the operation Bloom cannot do and the reason the cuckoo variant
    exists: a revisit policy expires URLs from the seen set without
    rebuilding filters over the other ~10^10 keys. Buckets with no
    deletions pass through untouched (no copy).

    PRECONDITION: every url in `urls` must be a MEMBER of the filter
    (i.e. was inserted and not yet deleted). Deleting a non-member can
    remove a colliding member's fingerprint — a (bucket, index, 16-bit
    fp) collision is near-certain across large batches at 10^10 keys —
    creating the false negative the gate contract forbids (a still-seen
    URL re-crawled). expire_seen enforces this by semi-joining the
    expiry set against the exact seen table before calling here; any
    other caller owns the same obligation."""
    import pyspark.sql.types as T

    hashed = with_url_hash(urls.select(canon_col).distinct(), canon_col).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    out_schema = T.StructType(
        [
            T.StructField("bucket", T.IntegerType()),
            T.StructField("table", T.BinaryType()),
            T.StructField("nb", T.LongType()),
            T.StructField("n_items", T.LongType()),
        ]
    )

    def delete_group(keys: pd.DataFrame, filt: pd.DataFrame) -> pd.DataFrame:
        if len(filt) == 0:
            return pd.DataFrame(columns=["bucket", "table", "nb", "n_items"])
        row = filt.iloc[0]
        if len(keys) == 0:
            return filt[["bucket", "table", "nb", "n_items"]]
        nb = int(row["nb"])
        table = (
            np.frombuffer(row["table"], dtype=np.uint16)
            .reshape(-1, _CUCKOO_SLOTS)
            .copy()
        )
        h2 = keys["url_hash2"].to_numpy(dtype=np.int64).view(np.uint64)
        fps = _cuckoo_fp(h2)
        i1s = _cuckoo_i1(h2, nb).astype(np.int64)
        removed = 0
        for k in range(len(keys)):
            fp = fps[k]
            for b in (
                int(i1s[k]),
                int(_cuckoo_partner(np.uint64(i1s[k]), np.uint16(fp), nb)),
            ):
                slot = np.nonzero(table[b] == fp)[0]
                if len(slot):
                    table[b][slot[0]] = 0
                    removed += 1
                    break
        return pd.DataFrame(
            {
                "bucket": [int(row["bucket"])],
                "table": [table.tobytes()],
                "nb": [nb],
                "n_items": [int(row["n_items"]) - removed],
            }
        )

    return (
        hashed.groupBy("bucket")
        .cogroup(filters.groupBy("bucket"))
        .applyInPandas(delete_group, out_schema)
    )


def expire_seen(
    seen: DataFrame,
    expired: DataFrame,
    filters: DataFrame | None = None,
    n_buckets: int = 64,
    canon_col: str = "canon_url",
) -> tuple[DataFrame, DataFrame | None]:
    """Revisit-policy expiry: remove `expired` URLs from the exact seen
    table (anti-join) and, when a partitioned cuckoo filter set is
    maintained, from the filters IN PLACE via cuckoo_delete — the
    operation that makes cuckoo (not Bloom) the north rule's seen-set
    scale variant: expiring 1% of 10^10 URLs touches only the affected
    buckets' fingerprint slots instead of rebuilding every filter.
    Returns (seen', filters' | None); expired URLs will pass the
    not-visited gate again on the next crawl round."""
    new_seen = seen.join(
        expired.select(F.col(canon_col)), on=canon_col, how="left_anti"
    )
    new_filters = None
    if filters is not None:
        # cuckoo_delete's membership PRECONDITION: deleting a key that
        # was never inserted can strip a colliding member's fingerprint
        # and silently break the no-false-negatives contract. Callers
        # pass arbitrary revisit frames ("or any df with url/canon_url",
        # plans/crawler.py), so restrict the delete set to actual
        # members via a semi-join against the exact seen table — the
        # expiry batch is the small side, so this is one broadcast-ish
        # semi join, not a scan of the filters.
        members = expired.select(F.col(canon_col)).join(
            seen.select(F.col(canon_col)), on=canon_col, how="left_semi"
        )
        new_filters = cuckoo_delete(filters, members, n_buckets, canon_col)
    return new_seen, new_filters


def cuckoo_gate(
    candidates: DataFrame,
    seen: DataFrame,
    n_buckets: int = 64,
    canon_col: str = "canon_url",
    broadcast_max_bytes: int = 64 << 20,
) -> DataFrame:
    """Cuckoo-accelerated not-visited gate; contract identical to
    bloom_gate (definitely-new rows skip the exact anti-join shuffle;
    maybe-seen residue resolved exactly — output == plain anti-join)."""
    filters = build_cuckoo_filters(seen, n_buckets, canon_col).cache()
    total_bytes = (
        filters.agg((F.sum("nb") * _CUCKOO_SLOTS * 2).alias("b")).collect()[0]["b"]
    ) or 0
    if total_bytes <= broadcast_max_bytes:
        probed = cuckoo_maybe_seen(candidates, filters, n_buckets, canon_col)
    else:
        probed = cuckoo_maybe_seen_cogroup(candidates, filters, n_buckets, canon_col)
    definitely_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen", "url_hash")
    maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen", "url_hash")
    return definitely_new.unionByName(anti_join_seen(maybe, seen, canon_col))


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
