"""Per-host politeness budgets and round slicing — skew-proof top-k.

Reference semantics being re-expressed:
* batch slicing: `batched_jobs.slice!(0, batch_size)` — at most
  `batch_size` jobs processed per slice (batch_job.rb:283-312, :46);
* job-limit backpressure: over-limit jobs are checkpointed and
  recovered later, never lost (batch_job.rb:229-268,
  spec/batch_job_spec.rb:162-259);
* per-job `sleep(delay)` politeness (batch_job.rb:181) becomes a
  per-host fetch budget per round.

Selection order is the deterministic crawl order: (priority DESC,
depth, parent_rank, link_pos) — never partition/task order.

Skew: one hot host (90% of the frontier) would make a plain
`Window.partitionBy(host)` rank a straggler. `select_budget` therefore
runs a TWO-STAGE top-k: stage 1 ranks within (host, salt) — salt =
pmod(url_hash, salt_buckets) — keeping at most `budget` per salted
group; stage 2 re-ranks the ≤ budget*salt_buckets survivors per host.
Semantics are identical to a single per-host top-k (any row in the true
per-host top-`budget` is in its salt group's top-`budget`), but the
heavy window is spread over salt_buckets× more partitions. AQE handles
join skew; this handles *window* skew, which AQE does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def order_cols():
    """Deterministic crawl-order sort keys (O1)."""
    return [
        F.col("priority").desc(),
        F.col("depth").asc(),
        F.col("parent_rank").asc(),
        F.col("link_pos").asc(),
    ]


def select_budget(
    frontier: DataFrame,
    host_budget: int | None,
    batch_size: int | None,
    salt_buckets: int = 8,
    host_budgets: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split pending frontier rows into (selected, deferred).

    host_budget: max fetches per host per round (None = unlimited).
    batch_size:  global max fetches per round (None = unlimited).
    host_budgets: optional per-host overrides (host, budget) — e.g.
      robots Crawl-delay translated by operators/robots.delay_budgets.
      A listed host uses its own budget; unlisted hosts fall back to
      host_budget (or no per-host cap when host_budget is None).
    Deferred rows keep all columns and re-compete next round in the
    same deterministic order — the no-loss guarantee the reference's
    checkpoint specs assert.
    """
    if host_budget is None and batch_size is None and host_budgets is None:
        # no budgets: everything pending is selected, nothing deferred —
        # skip the windows entirely
        empty = frontier.sparkSession.createDataFrame([], frontier.schema)
        return frontier, empty

    cols = frontier.columns
    deferred_parts = []
    selected = frontier

    if host_budget is not None or host_budgets is not None:
        salted = selected.withColumn(
            "_salt", F.pmod(F.xxhash64("canon_url"), F.lit(salt_buckets))
        )
        default_cap = (
            F.lit(host_budget).cast("int")
            if host_budget is not None
            else F.lit(None).cast("int")
        )
        if host_budgets is not None:
            overrides = F.broadcast(
                host_budgets.select(
                    F.col("host").alias("_bhost"),
                    F.col("budget").cast("int").alias("_hb"),
                )
                # one row per host ALWAYS (min = the politest budget):
                # a duplicate override row would fan out every frontier
                # row of that host through the left join below
                .groupBy("_bhost").agg(F.min("_hb").alias("_hb"))
            )
            salted = salted.join(
                overrides, F.col("host") == F.col("_bhost"), "left"
            )
            # an override may only TIGHTEN the operator's host_budget,
            # never raise it — a site's tiny Crawl-delay must not grant
            # it more fetches than the crawl's own politeness cap
            cap = F.coalesce(
                F.least(F.col("_hb"), default_cap), F.col("_hb"), default_cap
            )
        else:
            cap = default_cap
        # cap NULL = this host has no per-host limit this round. Such
        # rows can NEVER be deferred, so they bypass the windows
        # entirely (r5 review): under honor_crawl_delay with
        # host_budget=None, every host WITHOUT a Crawl-delay override
        # previously paid a full per-host window over its whole pending
        # set just to compute a rank that was then ignored — an
        # unbounded hot-host sort for nothing. Only capped hosts (a
        # single cap value per host by construction) go through the
        # salted two-stage top-k.
        salted = salted.withColumn("_cap", cap)
        uncapped = salted.where(F.col("_cap").isNull())
        capped = salted.where(F.col("_cap").isNotNull())
        w1 = Window.partitionBy("host", "_salt").orderBy(*order_cols())
        stage1 = capped.withColumn("_r1", F.row_number().over(w1))
        over1 = F.col("_r1") > F.col("_cap")
        deferred_parts.append(stage1.where(over1).select(*cols))
        w2 = Window.partitionBy("host").orderBy(*order_cols())
        stage2 = stage1.where(~over1).withColumn("_r2", F.row_number().over(w2))
        over2 = F.col("_r2") > F.col("_cap")
        deferred_parts.append(stage2.where(over2).select(*cols))
        selected = stage2.where(~over2).select(*cols).unionByName(
            uncapped.select(*cols)
        )

    if batch_size is not None:
        # global cap: two-stage again — top batch_size per bucket, then
        # a single bounded global window. The stage-1 grouping can be
        # ANY disjoint partition of the rows (global top-k is always
        # contained in the union of per-group top-k), so bucket by the
        # URL hash, NOT the host: a host-derived key re-creates the
        # exact hot-host window straggler this module exists to prevent
        # whenever the host stage above is skipped (default config:
        # host_budget=None, batch_size=1000 — r5 review).
        wb = Window.partitionBy(
            F.pmod(F.xxhash64("canon_url"), F.lit(64))
        ).orderBy(*order_cols())
        b1 = selected.withColumn("_rb", F.row_number().over(wb))
        deferred_parts.append(b1.where(F.col("_rb") > batch_size).select(*cols))
        wg = Window.partitionBy().orderBy(*order_cols())
        b2 = (
            b1.where(F.col("_rb") <= batch_size)
            .withColumn("_rg", F.row_number().over(wg))
        )
        deferred_parts.append(b2.where(F.col("_rg") > batch_size).select(*cols))
        selected = b2.where(F.col("_rg") <= batch_size).select(*cols)

    deferred = deferred_parts[0]
    for p in deferred_parts[1:]:
        deferred = deferred.unionByName(p)
    return selected, deferred


def allocate_budget(
    host_scores: DataFrame,
    total_budget: int,
    host_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a round's global
    fetch budget across hosts by integer weight — the scheduler step
    that turns per-host signals (TrustRank ppm, revisit priority,
    change rate) into the per-host budgets select_budget enforces.
    Returns (host_col, budget bigint) with sum(budget) == total_budget
    exactly (zero-weight hosts get 0 and don't compete); quota
    floor(total * w / W) per host, the K = total - sum(floors)
    largest remainders get +1, remainder ties broken by host ASC so
    the allocation is deterministic.

    All arithmetic is BIGINT (weights are integers by contract — pass
    ppm/permille fixed-point for float signals): floor and remainder
    are exact `div`/`%`, never doubles, so the same allocation falls
    out of the SQL oracle bit-for-bit. Scale shape: W and K ride
    1-row broadcast crossJoins (the PageRank dangling-mass pattern);
    the remainder ranking reuses with_global_rank's range-partition
    prefix-sum machinery — no single-partition window at 10^8 hosts,
    no driver state beyond one Long per partition.
    """
    from cloud_crawler_spark.operators.rank import with_global_rank

    w = F.col(weight_col).cast("long")
    live = host_scores.where(w > 0).select(
        F.col(host_col), w.alias("_w")
    )
    # alias-qualified references: crossJoining an aggregate of `live`
    # back onto `live` trips Spark's self-lineage ambiguity check on
    # bare names even when the aggregate's output shares none of them
    tot = live.select(F.col("_w").alias("_tw")).agg(
        F.sum("_tw").alias("_W")
    )
    quotas = live.alias("L").crossJoin(F.broadcast(tot.alias("T"))).select(
        host_col,
        F.expr(f"({total_budget} * L._w) div T._W").alias("_floor"),
        F.expr(f"({total_budget} * L._w) % T._W").alias("_rem"),
    )
    k = quotas.select(F.col("_floor").alias("_kf")).agg(
        (F.lit(total_budget) - F.sum("_kf")).alias("_k")
    )
    ranked = with_global_rank(
        quotas, [F.col("_rem").desc(), F.col(host_col).asc()],
        rank_col="_r",
    )
    alloc = ranked.alias("R").crossJoin(F.broadcast(k.alias("K"))).select(
        host_col,
        (F.col("R._floor") + (F.col("R._r") <= F.col("K._k")).cast("long"))
        .alias("budget"),
    )
    zero = host_scores.where(~(w > 0)).select(
        F.col(host_col), F.lit(0).cast("long").alias("budget")
    )
    return alloc.unionByName(zero)


def fetch_schedule(
    batch: DataFrame,
    delays: DataFrame | None = None,
    default_delay: float = 1.0,
    host_col: str = "host",
    url_col: str = "canon_url",
    priority_col: str = "priority",
) -> DataFrame:
    """Politeness timeline for a budget-clamped batch: WHEN each queued
    URL will be fetched, given per-host crawl delays.

    Within a host, fetches are sequential (one connection, Crawl-delay
    between requests — the reference's per-job ``sleep(delay)``,
    batch_job.rb:181); across hosts they are parallel. So each URL's
    projected start is ``slot * delay`` where slot is its 0-based
    position in the host's queue ordered by (priority DESC, url) —
    the capacity-planning view ("can this batch finish inside the
    round?") that sizes batch_size against the slowest host.

    batch: (host, canon_url, priority, ...). delays: optional
    (host, delay_s double) — robots Crawl-delay values (see
    robots.crawl_delays); hosts absent fall back to default_delay.

    Returns batch columns + (slot bigint, eta_s double). The per-host
    makespan is then ONE groupBy(max(eta_s)) away.

    Scale shape: the per-host window is inherently host-sequential
    (that IS the semantics), so this runs AFTER select_budget — the
    window input is budget-clamped (≤ budget rows per host), never the
    raw frontier; the delays side is a broadcast-sized dimension.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    out = batch.withColumn(
        "slot", (F.row_number().over(w) - 1).cast("long")
    )
    if delays is not None:
        d = delays.select(
            F.col(delays.columns[0]).alias(host_col),
            F.col(delays.columns[1]).cast("double").alias("_delay"),
        )
        out = out.join(F.broadcast(d), host_col, "left")
    else:
        out = out.withColumn("_delay", F.lit(None).cast("double"))
    return out.withColumn(
        "eta_s",
        F.col("slot") * F.coalesce(F.col("_delay"), F.lit(float(default_delay))),
    ).drop("_delay")


def aimd_rates(
    fetch_log: DataFrame,
    n_rounds: int,
    init_rate: int = 4,
    max_rate: int = 16,
    host_col: str = "host",
    round_col: str = "round",
    code_col: str = "code",
) -> DataFrame:
    """AIMD adaptive per-host fetch rate — TCP's congestion rule
    applied to politeness (additive increase on clean rounds,
    multiplicative decrease on throttle signals): replay a fetch log
    round by round per host; any HTTP 429 in a round halves the
    host's rate (floor, min 1), a clean fetched round adds 1 (cap
    `max_rate`), a round with no fetches holds. The result seeds the
    next crawl's per-host budget (politeness.host_budget /
    allocate_budget weights) from observed server pushback instead of
    a global constant.

    Returns (host, final_rate, n_throttle_rounds, n_active_rounds).
    All-integer arithmetic — the DuckDB oracle reproduces the fold
    bit-for-bit via list_reduce.

    Scale shape: one map-side-combinable groupBy(host, round), one
    groupBy(host) building a round->flag map, then the whole rate
    replay is ONE codegen aggregate() fold over an n_rounds-long
    array per host — no per-round joins, no window, no UDF; rounds
    are a constant, hosts shard the shuffle.
    """
    is_thr = F.max((F.col(code_col) == 429).cast("int")).alias("_thr")
    per_round = fetch_log.groupBy(
        F.col(host_col).alias("host"),
        F.col(round_col).cast("int").alias("_r"),
    ).agg(is_thr)
    per_host = per_round.groupBy("host").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_r"), F.col("_thr")))
        ).alias("_m")
    )
    flags = F.transform(
        F.sequence(F.lit(0), F.lit(n_rounds - 1)),
        lambda r: F.coalesce(F.element_at(F.col("_m"), r), F.lit(-1)),
    )
    folded = F.aggregate(
        flags,
        F.lit(int(init_rate)),
        lambda acc, f: F.when(
            f == 1, F.greatest(F.lit(1), F.floor(acc / 2).cast("int"))
        )
        .when(f == 0, F.least(F.lit(int(max_rate)), acc + 1))
        .otherwise(acc),
    )
    return per_host.select(
        "host",
        folded.cast("long").alias("final_rate"),
        F.size(F.filter(flags, lambda f: f == 1))
        .cast("long")
        .alias("n_throttle_rounds"),
        F.size(F.filter(flags, lambda f: f >= 0))
        .cast("long")
        .alias("n_active_rounds"),
    )


def compliance_audit(
    fetch_log: DataFrame,
    delays: DataFrame | None = None,
    default_delay: float = 1.0,
    host_col: str = "host",
    ts_col: str = "fetch_ts",
) -> DataFrame:
    """Politeness compliance audit over a fetch log: did the crawler
    actually honor each host's Crawl-delay? The evidence table an
    operator reads after a run (and the one to show a webmaster):
    per host, the observed inter-fetch gaps vs the declared delay.

    fetch_log: (host, fetch_ts double epoch-seconds, ...). delays:
    optional (host, delay_s) — robots Crawl-delay; absent hosts use
    default_delay.

    Returns per host: (host, n_fetches, min_gap_s, avg_gap_s,
    violations, delay_s) where violations counts gaps strictly under
    the host's delay. Single-fetch hosts report NULL gaps and 0
    violations.

    Scale shape: ONE lag window per host (partition key = host, the
    same bounded-skew shape as every politeness window — audit logs
    are per-round, so the window input is budget-clamped) + ONE
    map-side-combinable groupBy; the delay table is a broadcast
    dimension. All arithmetic on doubles with exact comparisons, so
    the SQL oracle matches bit-for-bit.
    """
    gapped = fetch_log.select(
        F.col(host_col), F.col(ts_col).cast("double").alias("_ts")
    ).withColumn("_gap", F.col("_ts") - F.lag("_ts").over(
        Window.partitionBy(host_col).orderBy(F.col("_ts").asc())
    ))
    if delays is not None:
        d = delays.select(
            F.col(delays.columns[0]).alias(host_col),
            F.col(delays.columns[1]).cast("double").alias("_delay"),
        )
        gapped = gapped.join(F.broadcast(d), host_col, "left")
    else:
        gapped = gapped.withColumn("_delay", F.lit(None).cast("double"))
    eff = F.coalesce(F.col("_delay"), F.lit(float(default_delay)))
    return gapped.groupBy(host_col).agg(
        F.count("*").alias("n_fetches"),
        F.min("_gap").alias("min_gap_s"),
        F.avg("_gap").alias("avg_gap_s"),
        F.sum(
            F.when(F.col("_gap") < eff, 1).otherwise(0)
        ).cast("long").alias("violations"),
        F.first(eff).alias("delay_s"),
    )
