"""Mergeable frequency/cardinality sketches for corpus statistics at
100 TB: count-min heavy hitters, KMV and HyperLogLog distinct counts.

Exact `groupBy(token).count()` over a web corpus shuffles one row per
distinct key — at 10^10 URLs / 10^11 tokens the shuffle IS the job.
The sketches here bound that state to a few KiB per group and stay
mergeable (sum for CMS buckets, min-k for KMV, max for HLL registers),
so they map straight onto Spark's partial+final hash aggregation: the
map side combines locally and only the fixed-size sketch crosses the
wire. This is the same reasoning as the reference's fixed-size Redis
Bloom filter for URL-seen (redis_url_bloomfilter.rb:42-47) applied to
counting instead of membership.

All hashing is md5-derived (`conv(substr(md5(..),1,k),16,10)`), so an
external SQL engine reproduces every estimate bit-for-bit — the DuckDB
oracles in queries.py compute the SAME sketch, not the true counts.

Design notes per sketch:

* **Count-min** (Cormode & Muthukrishnan 2005): d independent rows of
  w counters; item -> bucket_i = h_i(item) mod w; estimate = min over
  rows. Built with ONE posexplode (x d rows) + ONE groupBy((row,
  bucket)) — map-side combinable, output exactly d*w rows regardless
  of input size, hence always broadcastable to the estimate join.
* **KMV / bottom-k** (Bar-Yossef et al. 2002): keep the k smallest
  distinct hash values; if the k-th smallest normalized hash is u_k,
  distinct ~= (k-1)/u_k; exact when fewer than k distinct values.
* **HyperLogLog** (Flajolet et al. 2007): 2^p registers keep the max
  leading-zero rank of the non-register hash bits; harmonic-mean
  estimate with the standard small-range (linear counting)
  correction. Registers are exact integers on both engines; the only
  float work is the final estimate (sums of 2^-M_j agree far beyond
  the oracle's 12-significant-digit comparison).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h32(col: Column, salt: str = "") -> Column:
    """First 8 md5 hex digits (32-bit int) of salt || value."""
    s = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


# ---------------------------------------------------------------- CMS


def cms_build(df: DataFrame, item_col: str, d: int = 4,
              w: int = 1024, weight_col: str | None = None) -> DataFrame:
    """Count-min sketch of the items in ``df[item_col]`` (one item per
    row — explode upstream): DataFrame (row int, bucket int, cnt long)
    with exactly d*w rows.

    Shape: the d per-row buckets are computed in ONE projection as an
    array, posexploded (x d, d is 3-5), then ONE groupBy((row,
    bucket)) — partial aggregation collapses each map partition to
    <= d*w rows before the shuffle, so the reduce input is bounded by
    (n_partitions * d * w), never by corpus size."""
    wgt = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    buckets = F.array(*[
        (_h32(F.col(item_col), f"{i}:") % w) for i in range(d)
    ])
    return (
        df.select(F.posexplode(buckets).alias("row", "bucket"), wgt.alias("_w"))
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(cms: DataFrame, items: DataFrame, item_col: str,
                 d: int = 4, w: int = 1024) -> DataFrame:
    """Point-estimate counts for each row of ``items``: adds an ``est``
    column = min over the d rows of the item's bucket counter.

    The sketch side is d*w rows by construction, so the join is a
    broadcast hash join at any corpus size; absent buckets count 0."""
    keyed = items.select(
        F.col(item_col),
        F.posexplode(F.array(*[
            (_h32(F.col(item_col), f"{i}:") % w) for i in range(d)
        ])).alias("row", "bucket"),
    )
    return (
        keyed.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(df: DataFrame, item_col: str, threshold: int,
                      d: int = 4, w: int = 1024) -> DataFrame:
    """Items whose CMS estimate >= threshold: (item, est).

    Candidates are the distinct items (a second bounded groupBy); the
    one-sided CMS error means no true heavy hitter is missed — the
    filter can only let borderline extras through (classic CMS
    guarantee: est >= true, est <= true + eps*N w.h.p.)."""
    cms = cms_build(df, item_col, d=d, w=w)
    cand = df.select(item_col).distinct()
    return cms_estimate(cms, cand, item_col, d=d, w=w).where(
        F.col("est") >= threshold
    )


# ---------------------------------------------------------------- KMV


def kmv_distinct(df: DataFrame, key_col: str, group_col: str,
                 k: int = 64) -> DataFrame:
    """Bottom-k (KMV) distinct-count estimate per group:
    (group, n_kept int, est double).

    Hash each key to a 48-bit uniform u in (0,1] (12 md5 hex digits —
    exact in a double); per group keep the k smallest DISTINCT hashes.
    With n >= k distinct keys, est = (k-1)/u_k; with n < k the sketch
    holds every distinct hash and the count is exact.

    Shape: groupBy((group, hash)) dedups first (map-side combinable),
    then a per-group bottom-k. The window sort is per-group over
    distinct hashes; for skewed groups swap in the salted two-stage
    top-k from operators/politeness.select_budget — the merge of
    per-partition bottom-k lists is exactly KMV's mergeability."""
    v = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12),
               16, 10).cast("double")
    u = (v + F.lit(1.0)) / F.lit(float(16 ** 12))  # (0, 1], 0 excluded
    hashed = df.select(F.col(group_col), u.alias("_u")).groupBy(
        group_col, "_u").agg(F.lit(1).alias("_one"))
    win = Window.partitionBy(group_col).orderBy(F.col("_u").asc())
    ranked = hashed.select(
        group_col, "_u", F.row_number().over(win).alias("_rn")
    ).where(F.col("_rn") <= k)
    return ranked.groupBy(group_col).agg(
        F.count("*").alias("n_kept"),
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise((F.lit(float(k - 1)) / F.max("_u")))
        .alias("est"),
    )


# ---------------------------------------------------------------- HLL


def hll_distinct(df: DataFrame, key_col: str, group_col: str,
                 p: int = 8) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate per group:
    (group, registers_hit int, est double). m = 2^p registers.

    Register index = first p bits of md5 (hex digits 1..p/4); rank =
    1 + leading zeros of the next 52 bits, computed EXACTLY as
    53 - bitlength(v) via length(conv(v, 10, 2)) — no float log, so
    the registers are integer-identical on any engine with md5.
    Estimate = alpha_m * m^2 / (zeros + sum 2^-M_j), with linear
    counting (m * ln(m/zeros)) when E <= 2.5m and zeros > 0.

    Shape: ONE groupBy((group, register)).max(rank) — partial-agg
    collapses each map partition to <= m rows per group — then ONE
    groupBy(group). Per-group state is m small ints (m=256 default):
    the 10^10-URL per-host cardinality rollup costs 256 longs per
    host, not a distinct-shuffle of every URL."""
    m = 1 << p
    hexd = p // 4
    if p % 4:
        raise ValueError("p must be a multiple of 4 (hex-digit registers)")
    h = F.md5(F.col(key_col).cast("string"))
    reg = F.conv(F.substring(h, 1, hexd), 16, 10).cast("int")
    v = F.conv(F.substring(h, hexd + 1, 13), 16, 10).cast("long")
    # bitlength('0') is 1 but v=0 means 52 leading zeros -> rank 53.
    rank = F.when(v == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.conv(v, 10, 2))
    ).cast("int")
    regs = (
        df.select(F.col(group_col), reg.alias("_reg"), rank.alias("_rank"))
        .groupBy(group_col, "_reg")
        .agg(F.max("_rank").alias("_m"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy(group_col).agg(
        F.count("*").alias("registers_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_s"),
    )
    zeros = F.lit(m) - F.col("registers_hit")
    raw = F.lit(alpha * m * m) / (zeros.cast("double") + F.col("_s"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(group_col, "registers_hit", est.alias("est"))
