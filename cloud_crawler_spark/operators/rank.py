"""Deterministic global ranking without a single-partition window.

The crawl-order contract (reference: qless `Ordered` reserver,
driver.rb:95 — BFS by depth, discovery order within depth) requires a
total order `(depth, parent_rank, link_pos)` materialized as a dense
global rank. A naive `row_number().over(Window.orderBy(...))` collapses
to ONE partition — a non-starter at 10^10 rows.

`with_global_rank` computes the same rank scalably:
  1. range-repartition + sort within partitions on the order keys
     (a total order across partitions, same mechanism as df.sort),
  2. count rows per partition (tiny driver-side collect, one Long per
     partition),
  3. rank = per-partition row_number (parallel window, partitioned by
     the physical partition id) + broadcast prefix-sum offset.

Ties never straddle partitions because callers pass a key tuple that is
unique per row (enforced by including a final tiebreaker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


SMALL_INPUT_ROWS = 20_000  # below this a 1-partition window is cheaper;
# above it the serialized single-partition sort costs more wall time
# than the range-repartition machinery's extra (fully parallel) jobs


def with_global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    start: int = 1,
    num_partitions: int | None = None,
    known_count: int | None = None,
    stable_input: bool = False,
) -> DataFrame:
    """stable_input=True skips the localCheckpoint that pins the
    partitioning between the offsets job and the ranking job — pass it
    ONLY when df's LINEAGE is deterministic end-to-end (stable source
    files, no sample/limit/non-deterministic UDF), not merely cached:
    Spark cache blocks are evictable and lost on executor failure, so
    a recomputation between the two jobs falls back to lineage
    (ADVICE r4). With deterministic lineage a recompute reproduces the
    identical row set, the range boundaries (sampled from that same
    deterministic set) place every row in the same partition, and the
    offsets stay valid. The offsets pass additionally asserts its
    total row count equals known_count when provided — a cheap
    tripwire that catches COUNT-CHANGING recompute drift (dropped or
    duplicated rows). It cannot catch count-preserving drift (e.g. a
    nondeterministic tie-break that only moves rows between
    partitions); determinism of the lineage is the load-bearing
    requirement, the guard is defense in depth."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if known_count is not None and known_count <= SMALL_INPUT_ROWS:
        # small-input fast path: a single-partition window beats the
        # range-repartition machinery (no sampling pass, no collect)
        w = Window.orderBy(*order_cols)
        return df.withColumn(
            rank_col, (F.row_number().over(w) - 1 + F.lit(start)).cast("long")
        )
    if known_count is None and df.isEmpty():
        return df.withColumn(rank_col, F.lit(start).cast("long"))

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    parted = parted.withColumn("_pid", F.spark_partition_id())
    # materialize ONCE: the offsets collect and the ranking window are
    # two separate jobs over this lineage — a nondeterministic upstream
    # (sample/limit/non-deterministic UDF) could otherwise shift rows
    # between partitions across the two jobs and corrupt the offsets
    if not stable_input:
        parted = parted.localCheckpoint(eager=True)

    # tiny: one row per partition
    sizes = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    if known_count is not None and sum(sizes.values()) != known_count:
        raise RuntimeError(
            f"with_global_rank: offsets pass saw {sum(sizes.values())} rows "
            f"but caller counted {known_count} — the input lineage "
            "recomputed non-deterministically (evicted cache over a "
            "nondeterministic upstream). The caller that passed "
            "stable_input=True must make its lineage deterministic or "
            "stop passing stable_input=True (which restores the pinning "
            "localCheckpoint)."
        )
    offsets, acc = {}, start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    offset_expr = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        parted.withColumn(
            rank_col,
            (F.row_number().over(w) - 1 + offset_expr[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )


def with_prefix_sum(
    df: DataFrame,
    order_cols: list,
    weight,
    out_col: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE weighted prefix sum in a total order, distributed:
    out_col = sum of `weight` over all rows strictly before this one
    under order_cols — with_global_rank's machinery generalized from
    counting rows to summing an arbitrary weight expression (rank =
    prefix of weight 1, plus start). Same shape: range-repartition +
    sort, ONE weight-total per partition to the driver, broadcast
    prefix offsets, per-partition cumulative window. order_cols must
    end in a per-row tiebreaker so ties never straddle partitions.

    `weight` is a Column (or column name); it is evaluated once into
    an internal column so expressions are fine.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    w_expr = F.col(weight) if isinstance(weight, str) else weight
    # NULL weights count as 0: an all-NULL partition would otherwise
    # sum to NULL and crash the driver-side offsets loop
    df = df.withColumn("_w", F.coalesce(w_expr.cast("long"), F.lit(0)))
    if df.isEmpty():
        return df.withColumn(out_col, F.lit(0).cast("long")).drop("_w")

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    parted = parted.withColumn("_pid", F.spark_partition_id())
    # same two-job hazard as with_global_rank: pin the partitioning
    parted = parted.localCheckpoint(eager=True)
    # tiny: one weight-total per partition
    sizes = {
        r["_pid"]: r["b"]
        for r in parted.groupBy("_pid").agg(F.sum("_w").alias("b")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_expr = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        parted.withColumn(
            out_col,
            (
                F.coalesce(F.sum("_w").over(w), F.lit(0))
                + offset_expr[F.col("_pid")]
            ).cast("long"),
        )
        .drop("_w", "_pid")
    )
