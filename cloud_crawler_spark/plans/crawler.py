"""The iterative crawl driver — BFS rounds over the frontier table.

Replaces the reference's qless/Redis job queue + worker fleet
(driver.rb:214-226, worker.rb:27-38) with a driver `while` loop: each
iteration is one Spark job (one round, plans/round.py), each committed
round is a resumable snapshot (sources/store.py). BSP rounds make the
reference's cross-worker races (its in-batch visited recheck,
crawl_job.rb:89) structurally impossible while preserving its
observable semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloud_crawler_spark.config import CrawlConfig
from cloud_crawler_spark.functions.canon import with_canon
from cloud_crawler_spark.operators import rank as rank_ops
from cloud_crawler_spark.operators import robots as robots_ops
from cloud_crawler_spark.plans.round import run_round
from cloud_crawler_spark.sources.corpus import Corpus
from cloud_crawler_spark.sources.store import FRONTIER_SCHEMA, FrontierStore


@dataclass
class CrawlResult:
    crawled: DataFrame
    seen: DataFrame
    frontier: DataFrame
    lineage: DataFrame
    rounds: int
    stats: list = field(default_factory=list)


def seed_frontier(spark: SparkSession, seeds: DataFrame) -> DataFrame:
    """Seed rows -> round-0 frontier (S1/S2: normalize + canon; link_pos
    = position in the seed list defines the deterministic seed order,
    driver.rb:232-248)."""
    if "priority" not in seeds.columns:
        seeds = seeds.withColumn("priority", F.lit(0.0))
    s = with_canon(seeds, "url").where(F.col("canon_url").isNotNull())
    # first occurrence per canon_url, by seed-list position. Hand-fed
    # seed lists are small and take a single-partition window, but
    # sitemap/feed-driven re-seeding (S13, G87, G89 -> crawl) can feed
    # 10^8-row seed frames — above the rank operator's threshold the
    # ranking goes through the range-partitioned prefix-sum path so no
    # single partition ever holds the whole seed list.
    s = s.withColumn("_seed_pos", F.monotonically_increasing_id())
    n_seeds = s.count()
    if n_seeds <= rank_ops.SMALL_INPUT_ROWS:
        s = s.withColumn(
            "link_pos",
            F.row_number().over(Window.orderBy(F.col("_seed_pos"))),
        )
    else:
        s = rank_ops.with_global_rank(
            s, [F.col("_seed_pos")], rank_col="link_pos", known_count=n_seeds
        )
    s = s.drop("_seed_pos")
    s = (
        s.groupBy("canon_url")
        .agg(F.min(F.struct("link_pos", "url", "host", "priority")).alias("f"))
        .select(
            "canon_url",
            F.col("f.url").alias("url"),
            F.col("f.host").alias("host"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("string").alias("referer"),
            F.col("f.priority").alias("priority"),
            F.lit(0).alias("round_added"),
            F.lit("pending").alias("status"),
            F.lit(0).cast("long").alias("parent_rank"),
            F.col("f.link_pos").cast("int").alias("link_pos"),
        )
    )
    return s


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        corpus: Corpus,
        config: CrawlConfig | None = None,
        store: FrontierStore | None = None,
    ):
        self.spark = spark
        self.corpus = corpus
        self.config = config or CrawlConfig()
        self.store = store
        rules = robots_ops.build_rules(spark, corpus.robots)
        # None when empty => the per-round robots gate is skipped outright
        self.robots_rules = None if rules.isEmpty() else rules.cache()
        # broadcast the per-host rule arrays only while they plausibly
        # fit executor memory; a Common-Crawl-scale rules table falls
        # back to a shuffle join (count() also warms the cache)
        self.robots_broadcast = (
            self.robots_rules is not None and self.robots_rules.count() <= 2_000_000
        )
        # live robots (Robotex parity, dsl_core.rb:237-241): fetch each
        # newly-discovered host's robots.txt through the live fetcher's
        # transport, accumulated across rounds (fetch-once-per-host)
        self._live_robots = bool(
            self.config.live_robots
            and self.config.obey_robots_txt
            and self.config.fetcher is not None
            and getattr(self.config.fetcher, "transport_factory", None) is not None
        )
        if self.config.live_robots and not self._live_robots:
            raise ValueError(
                "live_robots requires obey_robots_txt and a fetcher "
                "with a transport_factory (sources/http_fetch.HttpFetcher)"
            )
        # hosts whose robots are already authoritative. Seeding with the
        # corpus robots hosts means live refresh (a) never refetches a
        # corpus-covered host and (b) never UNIONS a second rule set /
        # Crawl-delay budget row for one — a duplicate (host, budget)
        # row would fan out every frontier row for that host through
        # select_budget's override join, double-fetching its URLs.
        self._robots_hosts = (
            corpus.robots.select("host").distinct().localCheckpoint(eager=True)
            if self._live_robots and corpus.robots is not None
            else spark.createDataFrame([], "host string")
        )
        # robots Crawl-delay -> per-host budget overrides (host, budget)
        self.host_budgets = None
        if self.config.honor_crawl_delay and corpus.robots is not None:
            hb = robots_ops.delay_budgets(
                robots_ops.crawl_delays(corpus.robots),
                self.config.round_window_sec,
            )
            if not hb.isEmpty():
                self.host_budgets = hb.cache()

    def _refresh_robots(self, links: DataFrame):
        """Fetch robots.txt for hosts in `links` not yet covered; fold
        their rules into the accumulated table. Fully distributed: the
        new-host set is an anti-join, bodies are fetched and parsed
        executor-side, and the growing rules table is checkpointed so
        the per-round plan stays flat."""
        new_hosts = (
            links.select("host").distinct()
            .join(self._robots_hosts, "host", "left_anti")
            .cache()
        )
        try:
            if not new_hosts.isEmpty():
                bodies = robots_ops.fetch_robots(
                    new_hosts, self.config.fetcher.transport_factory
                )
                if self.config.honor_crawl_delay:
                    # two consumers (rules + delays): pin the fetched
                    # bodies so hosts are not fetched twice
                    bodies = bodies.localCheckpoint(eager=True)
                    new_b = robots_ops.delay_budgets(
                        robots_ops.crawl_delays(bodies),
                        self.config.round_window_sec,
                    )
                    base_b = self.host_budgets
                    merged_b = (
                        new_b if base_b is None else base_b.unionByName(new_b)
                    ).localCheckpoint(eager=True)
                    self.host_budgets = None if merged_b.isEmpty() else merged_b
                new_rules = robots_ops.build_rules(self.spark, bodies)
                base = self.robots_rules
                merged = (
                    new_rules if base is None else base.unionByName(new_rules)
                ).localCheckpoint(eager=True)
                self.robots_rules = None if merged.isEmpty() else merged
                self._robots_hosts = self._robots_hosts.unionByName(
                    new_hosts.select("host")
                ).localCheckpoint(eager=True)
                self.robots_broadcast = (
                    self.robots_rules is not None
                    and self.robots_rules.count() <= 2_000_000
                )
        finally:
            new_hosts.unpersist()
        return self.robots_rules, self.robots_broadcast

    # ------------------------------------------------------------ run
    def run(
        self,
        seeds: DataFrame,
        initial_seen: DataFrame | None = None,
        expand: bool = True,
        dedup_gate: bool = True,
    ) -> CrawlResult:
        spark, cfg = self.spark, self.config
        frontier = seed_frontier(spark, seeds)
        seen = (
            initial_seen.select("canon_url")
            if initial_seen is not None
            else spark.createDataFrame([], "canon_url string")
        )
        if self.store is not None:
            self.store.commit_seed(frontier, seen)
        return self._loop(frontier, seen, round_no=0, next_rank=1, expand=expand, dedup_gate=dedup_gate)

    def resume(self) -> CrawlResult:
        """Resume from the last committed snapshot (S9/checkpoint)."""
        if self.store is None:
            raise ValueError("resume requires a FrontierStore")
        k = self.store.committed_round()
        frontier = self.store.frontier(k)
        seen = self.store.seen(k)
        m = self.store.manifest()
        next_rank = 1
        for r in m["rounds"]:
            next_rank = max(next_rank, int(r.get("next_rank", 1)))
        return self._loop(frontier, seen, round_no=k + 1, next_rank=next_rank)

    def _loop(
        self,
        frontier: DataFrame,
        seen: DataFrame,
        round_no: int,
        next_rank: int,
        expand: bool = True,
        dedup_gate: bool = True,
    ) -> CrawlResult:
        spark, cfg = self.spark, self.config
        crawled_parts: list[DataFrame] = []
        lineage_parts: list[DataFrame] = []
        stats = []
        rnd = round_no
        seen = seen.cache()
        seen_nonempty = not seen.isEmpty()
        _rounds_since_ckpt = 0
        _rows_since_ckpt = 0
        # one count up front; thereafter next_frontier's count feeds the
        # loop condition — no extra emptiness probe per round
        n_pending = frontier.where(F.col("status") == "pending").count()

        # before_crawl hook (dsl_front_end.rb:154-157, first_job gate
        # batch_job.rb:195-199): once, before any round
        if cfg.before_crawl is not None:
            cfg.before_crawl()

        # adaptive error backoff (cfg.error_backoff): cumulative
        # per-host failure counts, folded each round; tiny table
        # (one row per host ever crawled), checkpointed to keep the
        # per-round plan flat
        host_fail: DataFrame | None = None

        while rnd < cfg.max_rounds and n_pending > 0:
            if cfg.before_round is not None:
                cfg.before_round(rnd, frontier)
            budgets = self.host_budgets
            if cfg.error_backoff and host_fail is not None:
                backoff = (
                    host_fail.where(
                        (F.col("n_tot") >= cfg.error_backoff_min)
                        & (
                            F.col("n_fail")
                            >= F.col("n_tot") * cfg.error_backoff_threshold
                        )
                    )
                    .select(
                        "host",
                        F.lit(int(cfg.error_backoff_budget)).alias("budget"),
                    )
                )
                # min-merge with static overrides (Crawl-delay budgets):
                # ONE row per host — a duplicate (host, budget) row
                # would fan out that host's frontier rows through
                # select_budget's override join
                budgets = (
                    backoff
                    if budgets is None
                    else budgets.unionByName(backoff)
                    .groupBy("host")
                    .agg(F.min("budget").alias("budget"))
                )
            res = run_round(
                self.corpus, cfg, frontier, seen, self.robots_rules,
                round_no=rnd, next_rank=next_rank,
                expand=expand, dedup_gate=dedup_gate,
                seen_nonempty=seen_nonempty,
                robots_broadcast=self.robots_broadcast,
                robots_refresh=self._refresh_robots if self._live_robots else None,
                host_budgets=budgets,
            )
            # run_round localCheckpoints the fetched+parsed block (plan
            # truncation at the round boundary — without it an iterative
            # DataFrame loop goes exponential in analysis time and
            # driver heap); res.crawled/newly_seen are projections over
            # those checkpointed blocks. Only the next frontier still
            # needs its own checkpoint here.
            import os as _os, time as _time
            _dbg = _os.environ.get("SPARK_CRAWL_DEBUG") == "1"
            _t = _time.time()
            crawled = res.crawled
            next_frontier = res.next_frontier.localCheckpoint(eager=True)
            if _dbg:
                print(f"  [round {rnd}] ckpt frontier: {_time.time()-_t:.2f}s", flush=True); _t=_time.time()
            n_crawled = crawled.count()
            n_pending = next_frontier.where(F.col("status") == "pending").count()
            if _dbg:
                print(f"  [round {rnd}] counts: {_time.time()-_t:.2f}s", flush=True)
            if cfg.error_backoff and n_crawled > 0:
                rd_fail = crawled.groupBy("host").agg(
                    F.count("*").alias("n_tot"),
                    F.sum(
                        F.when(
                            (~F.coalesce(F.col("fetched"), F.lit(False)))
                            | (F.coalesce(F.col("code"), F.lit(0)) >= 500),
                            1,
                        ).otherwise(0)
                    ).alias("n_fail"),
                )
                host_fail = (
                    rd_fail
                    if host_fail is None
                    else host_fail.unionByName(rd_fail)
                    .groupBy("host")
                    .agg(
                        F.sum("n_tot").alias("n_tot"),
                        F.sum("n_fail").alias("n_fail"),
                    )
                ).localCheckpoint(eager=True)
            newly_seen = res.newly_seen

            # DSL page hooks (on_every_page / on_pages_like,
            # dsl_front_end.rb:178-194, dispatch dsl_core.rb:183-185):
            # run before the round commits, like the reference's page
            # blocks which run before the store/mark step. The crawled
            # block is checkpointed, so hook actions don't re-execute
            # the fetch/parse work.
            if cfg.page_hook is not None:
                cfg.page_hook(crawled)
            for _pat, _hook in cfg.page_hooks_like:
                _hook(crawled.where(F.col("url").rlike(_pat)))
            # after_batch analog (batch_job.rb:193-212 do_post_batch):
            # runs after the round's pages exist, before the commit
            if cfg.after_round is not None:
                cfg.after_round(rnd, crawled)

            next_rank += res.n_selected
            # lineage is tiny (<= n_host_buckets rows) but its lazy
            # plan references the round's cached deferred slice —
            # checkpoint it eagerly so those caches can be RELEASED
            # now instead of staying pinned for the crawl's lifetime
            # (r5 review)
            lineage = res.lineage.localCheckpoint(eager=True)
            if self.store is not None:
                self.store.commit_round(
                    rnd, crawled, newly_seen, next_frontier, lineage,
                    stats={"next_rank": next_rank, "crawled": n_crawled},
                )
            for _c in res.caches:
                _c.unpersist()
            crawled_parts.append(crawled)
            lineage_parts.append(lineage)
            stats.append({"round": rnd, "selected": res.n_selected, "crawled": n_crawled})

            # no distinct needed across rounds: `seen` stays
            # duplicate-free by construction (a seen URL is never
            # crawled again, and newly_seen is distinct within its
            # round). The union is lazy — each arm is already backed by
            # a checkpointed block, so no per-round copy of the whole
            # seen set. The union chain's arms are per-round distinct()
            # projections that every later round's gate re-executes, so
            # the checkpoint cadence is both round- AND size-triggered:
            # long crawls truncate every 8 rounds, bursty ones as soon
            # as the accumulated arms carry ~100k rows.
            seen = seen.unionByName(newly_seen)
            _rounds_since_ckpt += 1
            _rows_since_ckpt += n_crawled
            if _rounds_since_ckpt >= 8 or _rows_since_ckpt >= 100_000:
                seen = seen.localCheckpoint(eager=False)
                _rounds_since_ckpt = 0
                _rows_since_ckpt = 0
            seen_nonempty = seen_nonempty or n_crawled > 0
            frontier = next_frontier
            rnd += 1
            if not expand:
                break  # curl mode: single pass over the fetch list

        if crawled_parts:
            crawled_all = crawled_parts[0]
            for p in crawled_parts[1:]:
                crawled_all = crawled_all.unionByName(p)
        else:
            crawled_all = spark.createDataFrame([], _empty_crawled_schema())
        if lineage_parts:
            lineage_all = lineage_parts[0]
            for p in lineage_parts[1:]:
                lineage_all = lineage_all.unionByName(p)
        else:
            from cloud_crawler_spark.sources.store import LINEAGE_SCHEMA

            lineage_all = spark.createDataFrame([], LINEAGE_SCHEMA)

        result = CrawlResult(
            crawled=crawled_all,
            seen=seen,
            frontier=frontier,
            lineage=lineage_all,
            rounds=rnd - round_no,
            stats=stats,
        )
        # after_crawl hook (dsl_front_end.rb:160-163)
        if cfg.after_crawl is not None:
            cfg.after_crawl(result)
        return result


def _empty_crawled_schema() -> str:
    """Schema of CrawlResult.crawled for a crawl that ran ZERO rounds —
    must carry exactly round.CRAWLED_COLS (it was missing meta_robots,
    so an empty crawl's result could not unionByName with a real one;
    r5 review). Pinned against a live crawl in tests/test_plans.py."""
    return (
        "url string, canon_url string, host string, code int, depth int, "
        "referer string, redirect_to string, fetched boolean, visited boolean, "
        "error string, response_time int, content_type string, "
        "headers map<string,array<string>>, hop int, "
        "links array<string>, title string, text string, meta_robots string, "
        "html binary, "
        "round int, rank long, parent_rank long, link_pos int, priority double"
    )


# ------------------------------------------------------------ facade API


def crawl(
    spark: SparkSession,
    corpus: Corpus,
    seeds: DataFrame,
    config: CrawlConfig | None = None,
    store: FrontierStore | None = None,
    initial_seen: DataFrame | None = None,
) -> CrawlResult:
    """CloudCrawler.crawl / batch_crawl equivalent (driver.rb:41-57)."""
    return Crawler(spark, corpus, config, store).run(seeds, initial_seen)


def curl(
    spark: SparkSession,
    corpus: Corpus,
    urls: DataFrame,
    config: CrawlConfig | None = None,
) -> CrawlResult:
    """BatchCurlJob equivalent (C5, batch_curl_job.rb:55-93): fetch a
    list, no link expansion, no dedup gate."""
    return Crawler(spark, corpus, config).run(urls, expand=False, dedup_gate=False)


def recurring_crawl(
    spark: SparkSession,
    corpus_loader,
    seeds: DataFrame,
    config: CrawlConfig | None = None,
    n_runs: int = 2,
    interval_sec: float = 0.0,
) -> list[tuple[CrawlResult, DataFrame]]:
    """Recurring source (S10, driver.rb:214-226 queue.recur): re-submit
    the same crawl every interval. Each run reloads the corpus through
    `corpus_loader()` (new WARC dumps appear between runs) and is a
    FULL re-crawl — re-fetching known pages is what lets links to NEW
    pages be discovered, and the page store is idempotent by canonical
    URL exactly like the reference's (redis_page_store.rb:34-46 key
    overwrite). Returns [(result, delta)] per run, where delta is the
    canon_urls first seen in that run — the batch twin of
    streaming/ingest.py's incremental seen maintenance."""
    import time as _time

    out: list[tuple[CrawlResult, DataFrame]] = []
    prev_seen: DataFrame | None = None
    for i in range(n_runs):
        if i and interval_sec:
            _time.sleep(interval_sec)
        res = crawl(spark, corpus_loader(), seeds, config)
        if prev_seen is None:
            delta = res.seen
            prev_seen = res.seen.localCheckpoint(eager=True)
        else:
            delta = res.seen.join(prev_seen, "canon_url", "left_anti")
            prev_seen = (
                prev_seen.unionByName(delta).localCheckpoint(eager=True)
            )
        out.append((res, delta))
    return out


def revisit_crawl(
    spark: SparkSession,
    corpus: Corpus,
    seen: DataFrame,
    revisit: DataFrame,
    config: CrawlConfig | None = None,
    filters: DataFrame | None = None,
) -> tuple[CrawlResult, DataFrame | None]:
    """Freshness-driven partial recrawl — the scale-correct refinement
    of recurring_crawl's uniform re-crawl (driver.rb:214-226 recurs the
    ENTIRE crawl; at 10^10 URLs the budget must go to the stale few).

    seen: the maintained exact seen table; revisit: URLs selected for
    recrawl (operators/revisit.due_for_revisit output, or any df with
    url/canon_url); filters: optional partitioned cuckoo filter set
    kept in sync IN PLACE via cuckoo_delete (operators/seen) — the
    deletion capability that makes cuckoo the right seen-set variant
    for revisit policies.

    The expired URLs are removed from the seen set, then crawled as
    seeds against `corpus` with the reduced set as initial_seen: the
    revisited pages re-land in the store (idempotent by canon_url,
    redis_page_store.rb:34-46 key-overwrite semantics), links to pages
    discovered since last visit expand as usual, and everything still
    seen stays excluded. Returns (CrawlResult, filters').
    """
    from cloud_crawler_spark.operators.seen import expire_seen

    cfg = config or CrawlConfig()
    if "url" not in revisit.columns:
        revisit = revisit.withColumn("url", F.col("canon_url"))
    if "canon_url" not in revisit.columns:
        revisit = with_canon(revisit, "url")
    seen2, filters2 = expire_seen(
        seen, revisit, filters, n_buckets=cfg.n_host_buckets
    )
    res = crawl(
        spark, corpus, revisit.select("url"), cfg,
        initial_seen=seen2.localCheckpoint(eager=True),
    )
    return res, filters2
