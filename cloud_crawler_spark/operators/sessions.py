"""Gap-based sessionization of event streams.

The batch twin of the streaming ingest's stateful rollups: split each
entity's event sequence into sessions wherever the inter-event gap
exceeds a timeout, then aggregate per session. The crawl engine uses
the same shape for recurring-source visit analysis (per-host fetch
sessions) and for log-derived politeness tuning (how long does a host
stay "hot" after we start hitting it).

Scale shape: ONE shuffle on the entity key feeds both the lag() and
the running-sum window (same partitioning + sort, Spark reuses the
exchange), then one map-side-combinable groupBy on (entity,
session_seq). No join, no UDF, no driver state. All time arithmetic is
integer microseconds (unix_micros ≙ DuckDB epoch_us), so the oracle
matches bit-for-bit — no float epoch drift. Skewed mega-entities bound
the window's partition size — for 100 TB, pre-split entities above a
row cap by day before sessionizing (a no-op for web-scale user/host
keys, which are far below executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US = 1_000_000


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Split each entity's events into sessions at gaps > `gap_sec`.

    Returns one row per session: (entity, session_seq [1-based, in
    time order], n_events, start_epoch, end_epoch [floor seconds],
    duration_sec [floor of the microsecond span]). Equal-timestamp
    events share a session (gap 0) and count once each.
    """
    staged = events.select(
        F.col(entity_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    ep = F.col("_us")
    w = Window.partitionBy(entity_col).orderBy(ep.asc())
    gap = ep - F.lag(ep).over(w)
    is_break = F.when(
        gap.isNull() | (gap <= F.lit(gap_sec * US)), 0
    ).otherwise(1)
    wsum = Window.partitionBy(entity_col).orderBy(ep.asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = staged.select(
        F.col(entity_col), ep, is_break.alias("_brk")
    ).withColumn("session_seq", (F.sum("_brk").over(wsum) + 1).cast("long"))
    agg = tagged.groupBy(entity_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("_us").alias("_smin"),
        F.max("_us").alias("_smax"),
    )
    # integer `div`, never float `/`: epoch micros sit near 2^53 where a
    # float quotient can land one ulp under an exact second and floor off
    return agg.select(
        entity_col,
        "session_seq",
        "n_events",
        F.expr(f"_smin div {US}").cast("long").alias("start_epoch"),
        F.expr(f"_smax div {US}").cast("long").alias("end_epoch"),
        F.expr(f"(_smax - _smin) div {US}").cast("long")
        .alias("duration_sec"),
    )


def transitions(
    events: DataFrame,
    gap_sec: int = 1800,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    label_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Within-session transition mining — the Markov/funnel rollup of
    web analytics: for consecutive event pairs inside one session
    (same gap rule as `sessionize`), count each (from_label ->
    to_label) step and how many distinct entities took it. Feed it a
    page-view stream and it is the navigation-path graph; feed it the
    crawl log (entity=host, label=status class) and it shows
    fetch-outcome churn per host (200->429 spikes tune politeness).

    Deterministic: events are ordered by (timestamp, `id_col`) so
    equal-timestamp events have a stable order in both engines.

    Scale shape: ONE shuffle on the entity key feeds the session-break
    lag window, the running session counter, and the transition lag —
    all three windows share the exact same partitioning + ordering, so
    Spark plans one Exchange + one Sort; the rollup is one
    map-side-combinable groupBy on (from_label, to_label). No join,
    no UDF.
    """
    staged = events.select(
        F.col(entity_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
    )
    w = Window.partitionBy(entity_col).orderBy(
        F.col("_us").asc(), F.col("_id").asc()
    )
    gap = F.col("_us") - F.lag("_us").over(w)
    is_break = F.when(gap.isNull() | (gap <= F.lit(gap_sec * US)), 0).otherwise(1)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = (
        staged.withColumn("_brk", is_break)
        .withColumn("session_seq", F.sum("_brk").over(wsum))
        .withColumn("_prev_lbl", F.lag("_lbl").over(w))
        .withColumn("_prev_sess", F.lag("session_seq").over(w))
    )
    steps = tagged.where(
        F.col("_prev_lbl").isNotNull()
        & (F.col("_prev_sess") == F.col("session_seq"))
    )
    return steps.groupBy(
        F.col("_prev_lbl").alias("from_label"),
        F.col("_lbl").alias("to_label"),
    ).agg(
        F.count("*").alias("n_transitions"),
        F.countDistinct(entity_col).alias("n_entities"),
    )
