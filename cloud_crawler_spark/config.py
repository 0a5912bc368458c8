"""Crawl configuration.

Mirrors the reference's DSL option surface (DEFAULT_OPTS,
lib/cloud-crawler/dsl_front_end.rb:32-79) where the knob still makes
sense for a corpus-backed Spark crawl. User hooks that the reference
ships as serialized Ruby blocks (dsl_core.rb:172-197) are plain Python
callables here — `spark-submit --py-files` distributes code, so no
source-string gymnastics are needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence


@dataclass
class CrawlConfig:
    """Options for one crawl. Defaults follow the reference defaults.

    Reference knobs kept (dsl_front_end.rb:32-79):
      depth_limit, redirect_limit, keep_redirects, obey_robots_txt,
      skip_query_strings, inside_domain, outside_domain,
      skip_link_patterns (skip_links_like), discard_page, job_limit,
      batch_size (MAX_BATCH_SIZE, batch_job.rb:46), delay (politeness).
    Live-fetch knobs (user_agent, cookies, accept_cookies, proxy_host/
      proxy_port, read_timeout, basic-auth credentials) live on
      sources/http_fetch.HttpFetcher — they configure the transport,
      not the plan, and are meaningless in corpus mode.
    Dropped: verbose, save_batch, auto_increment, checkpoint (always
      on via the store).
    """

    # ---- link gating (visit_link? chain, dsl_core.rb:216-230) ----
    depth_limit: Optional[int] = None          # None = unlimited (ref default false)
    obey_robots_txt: bool = True               # dsl_front_end.rb:42
    # live robots.txt (Robotex parity, dsl_core.rb:237-241): fetch each
    # newly-discovered host's robots.txt through the live fetcher's
    # transport at link-expansion time and gate with the accumulated
    # rules (operators/robots.fetch_robots). Requires `fetcher` with a
    # transport_factory; opt-in so corpus-mode crawls (robots as a
    # corpus dim table) and transport test doubles are unaffected.
    live_robots: bool = False
    skip_query_strings: bool = False           # dsl_front_end.rb:53-54
    inside_domain: bool = True                 # follow same-host links (dsl_front_end.rb:62-65)
    outside_domain: bool = False               # follow off-host links
    skip_link_patterns: Sequence[str] = field(default_factory=tuple)  # skip_links_like
    link_selector: Optional[str] = None        # select_links_by (page.rb:123-136) wired to
                                               # frontier expansion like focus_crawl
                                               # (dsl_core.rb:195, examples/link_selector.rb):
                                               # XPath //div[@id='m']//a[@href] or CSS div.cls a
    anchor_pattern: Optional[str] = None       # focus_crawl text_for gate: keep a link only
                                               # when its anchor text matches this regex
                                               # (crossfit_crawl.rb:56-60 `text_for(lnk) =~
                                               # /Level 1/i` — pass "(?i)level 1"). Composes
                                               # with link_selector (both must pass).
    # REP robots-meta directives (beyond the 2013 reference, which
    # predates wide nofollow adoption): honor rel="nofollow" on links,
    # <meta name="robots" content="nofollow|none"> and the
    # X-Robots-Tag response-header twin at frontier expansion (none of
    # that page's links are followed). noindex is deliberately NOT a
    # crawl-time gate (REP: noindex pages may still be crawled) — the
    # stored meta_robots column + functions.parse.robots_directives
    # filter docs post-crawl.
    honor_robots_meta: bool = False

    # ---- redirects (http.rb) ----
    redirect_limit: int = 5                    # REDIRECT_LIMIT, http.rb:35
    keep_redirects: bool = True                # keep every hop page (crawl_job semantics);
                                               # False = keep only final page (batch_crawl default)

    # ---- frontier discipline ----
    batch_size: int = 1000                     # per-round global fetch cap (MAX_BATCH_SIZE)
    # job_limit: pending-frontier backpressure cap (batch_job.rb:229-241;
    # reference default 10_000 qless jobs). Rows beyond the cap are
    # SPILLED (status='spilled') in deterministic crawl order and
    # promoted back as the pending set drains — never lost
    # (spec/batch_job_spec.rb:162-259 recoverability). Default None =
    # unbounded: our frontier is a disk-native table, so the reference's
    # in-memory-queue protection is opt-in rather than default.
    job_limit: Optional[int] = None
    host_budget: Optional[int] = None          # per-host fetches per round (politeness);
                                               # None = unlimited within batch_size
    # honor robots.txt Crawl-delay (Robotex exposes it as #delay): each
    # declaring host's per-round budget becomes
    # max(1, floor(round_window_sec / delay)), overriding host_budget
    # for that host (operators/robots.delay_budgets)
    honor_crawl_delay: bool = False
    round_window_sec: float = 60.0             # wall-clock seconds one round stands in for
    # adaptive error backoff (beyond the reference, which retries per
    # request but never adapts the schedule): a host whose cumulative
    # fetch-failure fraction (not-fetched rows — transport errors and
    # corpus misses — plus 5xx responses) reaches the threshold after
    # at least `error_backoff_min` attempts has its per-round budget
    # clamped to `error_backoff_budget` for the rest of the crawl —
    # failing hosts stop eating the round's fetch batch while still
    # draining (budget >= 1 keeps progress guaranteed).
    error_backoff: bool = False
    error_backoff_threshold: float = 0.5
    error_backoff_min: int = 3
    error_backoff_budget: int = 1
    max_rounds: int = 1000                     # driver-loop safety bound

    # ---- projections ----
    discard_page: bool = False                 # drop html body from crawled output (page.rb:155-157)

    # ---- user hooks (DSL equivalents) ----
    # focus_crawl: given the exploded links DataFrame (columns include
    # href, path, host), return a filtered DataFrame. (dsl_front_end.rb:200-204)
    focus_filter: Optional[Callable] = None
    # on_every_page (dsl_front_end.rb:178-181): called once per round
    # with that round's crawled DataFrame — the set-oriented analog of
    # the reference's per-page block. Invoked by the driver loop
    # (plans/crawler.py) after the round's pages are materialized.
    page_hook: Optional[Callable] = None
    # on_pages_like (dsl_front_end.rb:187-194, dispatch dsl_core.rb:183-185):
    # (url_regex, hook) pairs; each hook is called per round with the
    # crawled rows whose url matches its regex.
    page_hooks_like: Sequence[tuple] = field(default_factory=tuple)
    # fetch stage override (S4/S6): a callable (selected_frontier_df,
    # config) -> fetched_df replacing the corpus join — the injection
    # point for the live-HTTP mapInPandas stage
    # (sources/http_fetch.py; reference http.rb:57-91, 211-240).
    fetcher: Optional[Callable] = None
    # before/after_crawl and before/after_batch (dsl_front_end.rb:154-172,
    # invoked batch_job.rb:193-225): crawl-level hooks run once around
    # the whole driver loop; round hooks run around each round (the
    # reference's "batch"). Signatures: before_crawl(), after_crawl
    # (CrawlResult), before_round(round_no, frontier_df),
    # after_round(round_no, crawled_df).
    before_crawl: Optional[Callable] = None
    after_crawl: Optional[Callable] = None
    before_round: Optional[Callable] = None
    after_round: Optional[Callable] = None

    # ---- scale knobs (ours, not the reference's) ----
    broadcast_fetch_rows: int = 1_000_000      # rounds up to this many URLs broadcast
                                               # the frontier slice into the corpus
                                               # scan (no corpus shuffle); larger
                                               # rounds use a shuffle join
    # Small-round parse re-partitioning: a broadcast fetch join leaves
    # the matched slice spread over every corpus-scan partition, so a
    # 14k-URL round fans out as 200-row Arrow batches whose per-task
    # python round-trip overhead never amortizes (measured: round-0
    # parse at 0.55 scaling eff vs 0.81 for a well-fed round). When a
    # round's rows/partition falls below fetch_rows_per_task/4, the
    # matched slice (ONLY the round's pages — never the corpus) is
    # exchanged down to n_selected/fetch_rows_per_task partitions,
    # floored at min_fetch_partitions. At cluster scale set
    # min_fetch_partitions to the cluster width; the exchange then
    # only ever fires on genuinely tiny tail rounds.
    fetch_rows_per_task: int = 2000
    min_fetch_partitions: int = 8
    n_host_buckets: int = 64                   # frontier partitioning: bucket(host)
    salt_buckets: int = 8                      # hot-host salting fan-out for budget top-k
    use_bloom: bool = False                    # probe partitioned Bloom before exact anti-join
    use_cuckoo: bool = False                   # probe partitioned cuckoo filter instead (16-bit
                                               # fingerprints, (2,4)-cuckoo; supports deletion —
                                               # operators/seen.cuckoo_delete — for revisit
                                               # policies). Mutually exclusive with use_bloom;
                                               # both paths resolve their maybe-seen residue with
                                               # the exact anti-join, so crawl output is identical
                                               # across exact/bloom/cuckoo.
    bloom_bits_per_key: int = 10
    bloom_num_hashes: int = 7                  # reference uses 7 (redis_url_bloomfilter.rb:47)
    # filter sets up to this many bytes are broadcast for the probe;
    # beyond it the probe cogroups candidates with their bucket's
    # filter row executor-side (filters never pass through the driver)
    bloom_broadcast_max_bytes: int = 64 << 20

    def effective_depth_limit(self) -> int:
        return self.depth_limit if self.depth_limit is not None else 1 << 30
