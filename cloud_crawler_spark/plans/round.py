"""One crawl round as a single declarative DataFrame pipeline.

A round re-expresses CrawlJob.perform / BatchCrawlJob.process_job
(crawl_job.rb:66-107, batch_crawl_job.rb:75-137) as set operations:

  pending frontier
    -> politeness budget top-k (O2/O3, window rank, salted)
    -> seen anti-join (F6/D2, optional Bloom pre-filter)
    -> deterministic global rank (O1: priority desc, depth,
       parent_rank, link_pos)
    -> corpus fetch join (S4) + bounded redirect resolution (S5/O5/F7)
    -> vectorized parse (P1-P5)
    -> link explode + gate chain (F1/F2/F4/F5/F9 + robots F3 +
       focus_crawl hook) + canonicalize
    -> first-occurrence dedupe (D5) + anti-join seen/pending (D4)
    -> (crawled, newly_seen, next_frontier, lineage)

Everything except the two irreducible string/HTML UDF stages (canon,
parse) is built-in pyspark.sql.functions — JVM-side, codegen-friendly,
filter-pushdown-friendly.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_crawler_spark.config import CrawlConfig
from cloud_crawler_spark.functions.canon import (
    absolutize_udf,
    canon_udf,
    host_udf,
)
from cloud_crawler_spark.functions.parse import with_parsed_resolved
from cloud_crawler_spark.operators import robots as robots_ops
from cloud_crawler_spark.operators.politeness import order_cols, select_budget
from cloud_crawler_spark.operators.rank import with_global_rank
from cloud_crawler_spark.operators.seen import (
    anti_join_seen,
    bloom_gate,
    cuckoo_gate,
)
from cloud_crawler_spark.sources.corpus import Corpus

# The canonical crawled-output column set (single source of truth:
# run_round's projection and crawler._empty_crawled_schema are both
# checked against it in tests/test_plans.py).
CRAWLED_COLS = [
    "url", "canon_url", "host", "code", "depth", "referer", "redirect_to",
    "fetched", "visited", "error", "response_time", "content_type",
    "headers", "hop", "links", "title", "text", "meta_robots", "html",
    "round", "rank", "parent_rank", "link_pos", "priority",
]

# content types the reference parses as HTML (page.rb:185-190 html?)
HTML_CONTENT_TYPES = r"^(text/html|application/xhtml\+xml)\b"


@dataclass
class RoundResult:
    crawled: DataFrame        # pages stored this round (incl. kept 301s & failures)
    newly_seen: DataFrame     # canon_url marked visited this round
    next_frontier: DataFrame  # pending rows for round k+1 (deferred + children)
    lineage: DataFrame        # per-host-bucket counters
    n_selected: int           # rows that consumed rank numbers
    # round-scoped cached DataFrames (deferred slice, expand-gate flag
    # join) for the driver to unpersist once the round's outputs are
    # checkpointed/committed — without an explicit release, lineage's
    # un-checkpointed plan kept every round's deferred cache referenced
    # for the crawl's lifetime (1000-round default = 1000 pinned
    # frontier slices in executor storage; r5 review)
    caches: tuple = ()


def _lookup(current: DataFrame, pages: DataFrame, redirects: DataFrame,
            broadcast_frontier: bool, page_keys: DataFrame) -> DataFrame:
    """One fetch lookup: current LEFT pages LEFT redirects on canon_url.

    broadcast_frontier=True (the round's selected slice is small, which
    the driver knows exactly): broadcast the FRONTIER side and stream
    the big corpus from cache — zero corpus shuffle. Spark can't
    broadcast the preserved side of a left-outer join, so the hit set
    is an inner join (corpus streamed, frontier broadcast-probed) and
    the 404 misses come from an anti-join against the corpus's slim
    canon_url key projection (Corpus.keys) — NOT against the hits arm,
    which would re-execute the full html-width corpus scan per round
    (measured ~3s/round at local[8], ~10s at local[2], pure fixed cost).
    False (round bigger than the broadcast budget): plain shuffle join —
    the right physical choice when millions of URLs fetch per round.
    Redirects are a dim table: always broadcast.
    """
    if broadcast_frontier:
        hits = pages.join(
            F.broadcast(current), pages["_p_canon"] == current["canon_url"], "inner"
        )
        misses = (
            current.join(
                page_keys.select(F.col("canon_url").alias("_hit")),
                F.col("canon_url") == F.col("_hit"),
                "left_anti",
            )
            .withColumn("_p_canon", F.lit(None).cast("string"))
            .withColumn("_p_html", F.lit(None).cast("binary"))
            .withColumn("_p_ctype", F.lit(None).cast("string"))
        )
        j = hits.unionByName(misses.select(*hits.columns))
    else:
        j = current.join(pages, current["canon_url"] == pages["_p_canon"], "left")
    return j.join(
        F.broadcast(redirects), j["canon_url"] == redirects["_r_canon"], "left"
    )


def _fetch(selected: DataFrame, corpus: Corpus, config: CrawlConfig,
           broadcast_frontier: bool = False) -> DataFrame:
    """Corpus-backed fetch with bounded redirect-chain resolution.

    Returns one row per STORED page (reference keeps each redirect hop
    when keep_redirects, else only the landing page), columns:
    frontier cols + rank + url/canon_url (possibly rewritten by
    redirects) + code, redirect_to, html, fetched.
    """
    pages = corpus.pages.select(
        F.col("canon_url").alias("_p_canon"),
        F.col("html").alias("_p_html"),
        F.col("content_type").alias("_p_ctype"),
    )
    redirects = corpus.redirects.select(
        F.col("canon_url").alias("_r_canon"), F.col("redirect_to").alias("_r_to")
    )

    # `current` rows still being resolved; hop 0 = the frontier row itself.
    current = selected.withColumn("_orig_host", F.col("host"))
    stored_parts: list[DataFrame] = []
    # bounded-loop shortcut: with no redirect rows at all, the chain
    # can't extend, so one hop suffices (keeps the plan shallow);
    # computed once per crawl (Corpus caches it), not per round
    any_redirects = corpus.has_redirects()

    for hop in range(config.redirect_limit + 1):
        j = _lookup(current, pages, redirects, broadcast_frontier,
                    corpus.keys())

        is_redirect = F.col("_r_to").isNotNull()
        landed = j.where(~is_redirect).select(
            *[F.col(c) for c in current.columns],
            F.when(F.col("_p_html").isNotNull(), F.lit(200)).otherwise(F.lit(404)).alias("code"),
            F.lit(None).cast("string").alias("redirect_to"),
            F.col("_p_html").alias("html"),
            F.col("_p_html").isNotNull().alias("fetched"),
            F.col("_p_ctype").alias("content_type"),
            # corpus rows have no wire headers: the 1-key to_hash
            # default (page.rb:66-67)
            F.when(
                F.col("_p_ctype").isNotNull(),
                F.create_map(F.lit("content-type"), F.array(F.col("_p_ctype"))),
            ).alias("headers"),
            F.lit(0).alias("response_time"),  # corpus join: no wire time (page.rb to_hash parity)
            F.lit(None).cast("string").alias("error"),
            F.lit(hop).alias("hop"),
        )
        stored_parts.append(landed)

        hops = j.where(is_redirect)
        if not any_redirects:
            break
        if hop == config.redirect_limit:
            # chain too long: store the 301 itself as the terminal row
            stored_parts.append(
                hops.select(
                    *[F.col(c) for c in current.columns],
                    F.lit(301).alias("code"),
                    F.col("_r_to").alias("redirect_to"),
                    F.lit(None).cast("binary").alias("html"),
                    F.lit(True).alias("fetched"),
                    F.lit(None).cast("string").alias("content_type"),
                    F.lit(None).cast("map<string,array<string>>").alias("headers"),
                    F.lit(0).alias("response_time"),
                    F.lit(None).cast("string").alias("error"),
                    F.lit(hop).alias("hop"),
                )
            )
            break
        if config.keep_redirects:
            stored_parts.append(
                hops.select(
                    *[F.col(c) for c in current.columns],
                    F.lit(301).alias("code"),
                    F.col("_r_to").alias("redirect_to"),
                    F.lit(None).cast("binary").alias("html"),
                    F.lit(True).alias("fetched"),
                    F.lit(None).cast("string").alias("content_type"),
                    F.lit(None).cast("map<string,array<string>>").alias("headers"),
                    F.lit(0).alias("response_time"),
                    F.lit(None).cast("string").alias("error"),
                    F.lit(hop).alias("hop"),
                )
            )
        # resolve: follow same-host (or relative) redirects only
        # (http.rb:245-247 allowed?; spec/crawl_job_spec.rb:106-113)
        ext = (
            hops.withColumn(
                "_next_url",
                absolutize_udf(F.col("_r_to"), F.col("url"), F.lit(None).cast("string")),
            )
            .withColumn("_next_host", host_udf(F.col("_next_url")))
        )
        followable = F.coalesce(
            F.col("_next_url").isNotNull()
            & (F.col("_next_host") == F.col("_orig_host")),
            F.lit(False),
        )
        if not config.keep_redirects:
            # Dead-end chains (cross-host target or unresolvable
            # Location) must still be RECORDED: with keep_redirects the
            # hop row above already stored them, but without it they
            # previously vanished — not stored, not marked seen — so
            # the URL consumed budget yet was re-enqueued and
            # re-fetched on every rediscovery (r5 review). Store the
            # terminal 301 like the chain-too-long branch does.
            stored_parts.append(
                ext.where(~followable).select(
                    *[F.col(c) for c in current.columns],
                    F.lit(301).alias("code"),
                    F.col("_r_to").alias("redirect_to"),
                    F.lit(None).cast("binary").alias("html"),
                    F.lit(True).alias("fetched"),
                    F.lit(None).cast("string").alias("content_type"),
                    F.lit(None).cast("map<string,array<string>>").alias("headers"),
                    F.lit(0).alias("response_time"),
                    F.lit(None).cast("string").alias("error"),
                    F.lit(hop).alias("hop"),
                )
            )
        nxt = ext.where(followable)
        current = (
            nxt.withColumn("url", F.col("_next_url"))
            .withColumn("canon_url", canon_udf(F.col("_next_url")))
            .withColumn("host", F.col("_next_host"))
            .drop("_p_canon", "_p_html", "_p_ctype", "_r_canon", "_r_to", "_next_url", "_next_host")
        ).cache()
        if current.isEmpty():  # no chains left: stop extending the plan
            break

    out = stored_parts[0]
    for part in stored_parts[1:]:
        out = out.unionByName(part)
    if any_redirects:
        # two chains may land on the SAME canon within the round (A and
        # B both 301 -> C): keep the first occurrence by crawl order
        # (rank, then hop) so crawled/newly_seen stay one-row-per-canon
        # — previously only promised by this comment, not implemented
        # (r5 review). Window bounded by the round's stored rows.
        from pyspark.sql import Window

        w = Window.partitionBy("canon_url").orderBy(
            F.col("rank").asc(), F.col("hop").asc()
        )
        out = (
            out.withColumn("_occ", F.row_number().over(w))
            .where(F.col("_occ") == 1)
            .drop("_occ")
        )
    return out.drop("_orig_host")


def _expand_links(
    crawled: DataFrame, corpus: Corpus, config: CrawlConfig, robots_rules: DataFrame,
    robots_broadcast: bool = True, robots_refresh=None,
) -> DataFrame:
    """Extracted links -> gated, canonicalized child frontier rows."""
    if config.honor_robots_meta:
        # REP page-level nofollow: the X-Robots-Tag response-header twin
        # of <meta name="robots"> (the meta form already emptied `links`
        # inside the parse UDF; it is re-checked here for free). Header
        # keys are case-folded; values like "noindex, nofollow" or
        # "googlebot: nofollow" token-match on [,:;\s] boundaries.
        # All-codegen: map_entries/filter/flatten + one rlike, no UDF.
        xrt = F.array_join(
            F.flatten(F.expr(
                "transform(filter(map_entries(headers),"
                " e -> lower(e.key) = 'x-robots-tag'), e -> e.value)"
            )),
            ",",
        )
        directives = F.lower(F.concat_ws(
            ",", F.coalesce(F.col("meta_robots"), F.lit("")), xrt
        ))
        crawled = crawled.where(
            ~directives.rlike(r"(^|[,:;\s])(nofollow|none)([,:;\s]|$)")
        )
    parents = crawled.where(
        (F.col("code") == 200)
        & F.col("fetched")
        & (F.col("depth") < F.lit(config.effective_depth_limit()))  # F5 too_deep?
    ).select(
        F.col("url").alias("_page_url"),
        F.col("host").alias("_page_host"),
        F.col("depth").alias("_page_depth"),
        F.col("rank").alias("_page_rank"),
        F.posexplode("links").alias("_lpos", "_l"),
    )
    # links were absolutized + canonicalized page-side inside the fused
    # parse UDF (functions/parse.py parse_resolve_udf) — no second
    # Python stage over the exploded (much larger) link set; element
    # order is document order, so posexplode's index IS link_pos. F9
    # empty/nil hrefs never leave the parser; unresolvable hrefs
    # surface as canon_url NULL and drop here.
    links = parents.select(
        "_page_url", "_page_host", "_page_depth", "_page_rank",
        F.col("_l.href").alias("href"),
        F.col("_l.abs_url").alias("abs_url"),
        F.col("_l.canon_url").alias("canon_url"),
        F.col("_l.host").alias("host"),
        F.col("_l.path").alias("path"),
        F.col("_lpos").cast("int").alias("link_pos"),
    ).where(F.col("canon_url").isNotNull())
    # F4 in_domain? (dsl_core.rb:246-252)
    same = F.col("host") == F.col("_page_host")
    links = links.where(
        F.when(same, F.lit(config.inside_domain)).otherwise(F.lit(config.outside_domain))
    )
    # F1 skip_links_like (path regex alternation, dsl_core.rb:277-279)
    if config.skip_link_patterns:
        pat = "|".join(f"(?:{p})" for p in config.skip_link_patterns)
        links = links.where(~F.col("path").rlike(pat))
    # F2 skip_query_strings (dsl_core.rb:269-271)
    if config.skip_query_strings:
        links = links.where(~F.col("path").contains("?"))
    # F3 robots (broadcast rules; dsl_core.rb:237-241). In live mode
    # (config.live_robots) the refresh hook first fetches robots.txt
    # for any host in this round's candidate links not yet covered —
    # the BSP analog of Robotex's fetch-on-first-use-per-host — and
    # returns the accumulated (rules, broadcast?) to gate with. The
    # links here derive from the round's checkpointed parse block, so
    # the refresh's distinct-hosts probe is a cheap scan, not a reparse.
    if config.obey_robots_txt and robots_refresh is not None:
        robots_rules, robots_broadcast = robots_refresh(links)
    if config.obey_robots_txt and robots_rules is not None:
        links = robots_ops.filter_allowed(
            links, robots_rules, "host", "path", broadcast=robots_broadcast
        )
    # focus_crawl hook (dsl_front_end.rb:200-204)
    if config.focus_filter is not None:
        links = config.focus_filter(links)

    children = links.select(
        F.col("canon_url"),
        F.col("abs_url").alias("url"),
        F.col("host"),
        (F.col("_page_depth") + 1).cast("int").alias("depth"),
        F.col("_page_url").alias("referer"),
        F.lit(0.0).alias("priority"),
        F.col("_page_rank").alias("parent_rank"),
        F.col("link_pos").cast("int"),
    )
    # D5/D4: first-occurrence dedupe by crawl order within the round
    w_first = F.struct(
        F.col("parent_rank"), F.col("link_pos"), F.col("depth"),
        F.col("url"), F.col("referer"), F.col("priority"), F.col("host"),
    )
    children = (
        children.groupBy("canon_url")
        .agg(F.min(w_first).alias("_first"))
        .select(
            "canon_url",
            F.col("_first.url").alias("url"),
            F.col("_first.host").alias("host"),
            F.col("_first.depth").alias("depth"),
            F.col("_first.referer").alias("referer"),
            F.col("_first.priority").alias("priority"),
            F.col("_first.parent_rank").alias("parent_rank"),
            F.col("_first.link_pos").alias("link_pos"),
        )
    )
    return children


def run_round(
    corpus: Corpus,
    config: CrawlConfig,
    frontier: DataFrame,
    seen: DataFrame,
    robots_rules: DataFrame,
    round_no: int,
    next_rank: int,
    expand: bool = True,
    dedup_gate: bool = True,
    seen_nonempty: bool = True,
    robots_broadcast: bool = True,
    robots_refresh=None,
    host_budgets: DataFrame | None = None,
) -> RoundResult:
    """Execute round `round_no`. `expand=False` = curl mode (C5):
    fetch-only, no link following; `dedup_gate=False` also skips the
    seen anti-join (batch_curl_job.rb:55-93 has neither).
    `seen_nonempty=False` (driver knows the seen set is empty) skips
    the anti-join / bloom machinery for round 0."""
    dbg = os.environ.get("SPARK_CRAWL_DEBUG") == "1"
    t0 = time.time()

    def _tick(label):
        nonlocal t0
        if dbg:
            now = time.time()
            print(f"  [round {round_no}] {label}: {now - t0:.2f}s", flush=True)
            t0 = now

    pending = frontier.where(F.col("status") == "pending")
    # rows spilled by job-limit backpressure in earlier rounds (only
    # ever present when job_limit is set; see the cap stage below)
    spilled_in = (
        frontier.where(F.col("status") == "spilled")
        if config.job_limit is not None
        else None
    )

    selected, deferred = select_budget(
        pending, config.host_budget, config.batch_size, config.salt_buckets,
        host_budgets=host_budgets,
    )
    deferred = deferred.cache()
    round_caches = [deferred]  # released by the driver post-commit

    if dedup_gate and seen_nonempty:
        if config.use_cuckoo:
            selected = cuckoo_gate(
                selected, seen,
                n_buckets=config.n_host_buckets,
                broadcast_max_bytes=config.bloom_broadcast_max_bytes,
            )
        elif config.use_bloom:
            selected = bloom_gate(
                selected, seen,
                n_buckets=config.n_host_buckets,
                bits_per_key=config.bloom_bits_per_key,
                num_hashes=config.bloom_num_hashes,
                broadcast_max_bytes=config.bloom_broadcast_max_bytes,
            )
        else:
            selected = anti_join_seen(selected, seen)

    selected = selected.cache()
    n_selected = selected.count()
    _tick(f"select+gate n={n_selected}")

    # O1: deterministic global crawl rank; cached because the fetch
    # plan references the slice several times (broadcast build, miss
    # anti-join, redirect resolution) — without the cache the rank
    # window would re-execute per reference, all serial wall time
    ranked = with_global_rank(
        selected,
        [F.col("priority").desc(), F.col("depth").asc(),
         F.col("parent_rank").asc(), F.col("link_pos").asc()],
        rank_col="rank",
        start=next_rank,
        known_count=n_selected,
        # stable_input=False: keep the pinning localCheckpoint for the
        # >SMALL_INPUT_ROWS range-partition path (small rounds take the
        # single-window path, which is one job and needs no pin). An
        # earlier round skipped it arguing the row SET is deterministic
        # — but repartitionByRange's boundaries come from reservoir
        # sampling over shuffle ARRIVAL ORDER, and a storeless round-0
        # frontier carries monotonically_increasing_id lineage
        # (seed_frontier), so an evicted cache could silently move rows
        # between range partitions against precomputed offsets —
        # count-preserving drift the rank guard cannot catch (r5
        # review). Crawl-order exactness is the north rule's core
        # criterion; the checkpoint is the guarantee, not the comment.
        stable_input=False,
    ).cache()

    # fetch strategy: the driver knows the exact round size — small
    # rounds broadcast the frontier slice (zero corpus shuffle), huge
    # rounds fall back to a shuffle join. config.fetcher (S4/S6
    # injection point, e.g. sources/http_fetch.HttpFetcher) replaces
    # the corpus join wholesale when set.
    if config.fetcher is not None:
        fetched = config.fetcher(ranked, config)
    else:
        broadcast_frontier = n_selected <= config.broadcast_fetch_rows
        fetched = _fetch(ranked, corpus, config, broadcast_frontier=broadcast_frontier)
        # small-round Arrow amortization (see config.fetch_rows_per_task):
        # the broadcast join's output partitioning is the corpus scan's,
        # so a small round leaves a few hundred rows per parse task and
        # per-task python overhead dominates. Exchange the matched slice
        # (volume = this round's pages only) down to well-fed partitions.
        # Gated to a clear win (>4x reduction) so big rounds — whose
        # batches are already full — never pay the exchange.
        if broadcast_frontier and n_selected > 0:
            cur_parts = fetched.rdd.getNumPartitions()
            target = max(
                n_selected // config.fetch_rows_per_task,
                config.min_fetch_partitions,
            )
            if target * 4 <= cur_parts:
                # hash, not round-robin: repartition(n) alone inserts a
                # deterministic full-row local sort (sortBeforeRepartition)
                # that compares the 20 KB html blobs; hashing canon_url
                # needs no sort and is just as balanced
                fetched = fetched.repartition(target, F.col("canon_url"))
    if os.environ.get("SPARK_CRAWL_DEBUG2") == "1":
        # measurement-only: split the fetch-join machinery from the
        # parse+checkpoint inside this round's single materialization
        fetched = fetched.cache()
        _n = fetched.count()
        _tick(f"fetch-join only n={_n}")
    # F8 content-type gate (page.rb:185-195 html?): only HTML bodies
    # are parsed — a non-HTML row is stored but yields no links/text,
    # so it is never expanded. Case-folded + trimmed: live servers
    # reply `Text/HTML` / ` text/html` and must still parse.
    gated = fetched.withColumn(
        "_html_in",
        F.when(
            F.lower(F.trim(F.col("content_type"))).rlike(HTML_CONTENT_TYPES),
            F.col("html"),
        ).otherwise(F.lit(None).cast("binary")),
    )
    parsed = with_parsed_resolved(
        gated, "_html_in", "url", selector=config.link_selector,
        anchor_pattern=config.anchor_pattern,
        honor_nofollow=config.honor_robots_meta,
    ).drop("_html_in")

    # one materialization per round: fetch+parse lands in the local
    # checkpoint, plan truncated; link expansion and the stored output
    # are cheap projections over the checkpointed blocks (no second
    # parse, no html-sized cache copy)
    crawled_ck = parsed.select(
        "url", "canon_url", "host", "code", "depth", "referer", "redirect_to",
        "fetched",
        # to_hash parity (page.rb:255-268): visited is an
        # analysis-stage flag in the reference (PageStore
        # shortest_paths!); under BSP rounds every stored row was by
        # construction visited this crawl
        F.lit(True).alias("visited"),
        "error", "response_time", "content_type", "headers",
        "hop", "links", "title",
        F.col("page_text").alias("text"),
        # REP page directives ("noindex,nofollow" style): populated only
        # under honor_robots_meta, NULL otherwise — same column either
        # way so the store schema is config-independent
        "meta_robots",
        (F.lit(None).cast("binary") if config.discard_page else F.col("html")).alias("html"),
        F.lit(round_no).alias("round"), "rank", "parent_rank", "link_pos", "priority",
    ).localCheckpoint(eager=True)
    _tick("fetch+parse+ckpt")
    # the checkpoint holds everything downstream needs — release the
    # intermediate caches now instead of waiting for GC-driven cleanup
    ranked.unpersist()
    selected.unpersist()

    crawled = crawled_ck.select(
        *[c for c in crawled_ck.columns if c not in ("links",)],
        F.col("links.href").alias("links"),
    )

    if expand:
        children = _expand_links(
            crawled_ck, corpus, config, robots_rules,
            robots_broadcast=robots_broadcast, robots_refresh=robots_refresh,
        )
        # D2: drop children already seen, already stored this round, or
        # already pending (first discovery wins across rounds)
        gate = (
            crawled.select("canon_url")
            .unionByName(deferred.select("canon_url"))
        )
        if spilled_in is not None:
            # spilled rows are still frontier members — a re-discovered
            # link to one must dedupe against it, not duplicate it
            gate = gate.unionByName(spilled_in.select("canon_url"))
        if dedup_gate and seen is not None and seen_nonempty:
            gate = gate.unionByName(seen.select("canon_url"))
        # one pass for both the gating and the dedup accounting: left
        # join a flag instead of (count, anti-join, count). The gate
        # union may hold duplicate keys — dropDuplicates on the (small)
        # gate side, NOT a full distinct of children
        flagged = children.join(
            gate.dropDuplicates(["canon_url"]).withColumn("_dup", F.lit(True)),
            "canon_url", "left",
        ).cache()
        round_caches.append(flagged)
        counts = {
            bool(r["dup"]): r["cnt"]
            for r in flagged.groupBy(F.coalesce("_dup", F.lit(False)).alias("dup"))
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        _tick(f"expand+gate children={sum(counts.values())}")
        n_deduped = counts.get(True, 0)
        children = flagged.where(F.col("_dup").isNull()).select(
            "canon_url", "url", "host", "depth", "referer", "priority",
            F.lit(round_no + 1).alias("round_added"),
            F.lit("pending").alias("status"),
            "parent_rank", "link_pos",
        )
    else:
        children = frontier.sparkSession.createDataFrame(
            [], frontier.schema
        )
        n_deduped = 0

    next_frontier = deferred.unionByName(children.select(*deferred.columns))

    # O3 job-limit backpressure (batch_job.rb:229-241): cap the PENDING
    # frontier at job_limit rows; overflow is spilled (status='spilled')
    # in deterministic crawl order and promoted back as pending drains —
    # recoverable, never lost (spec/batch_job_spec.rb:162-259). The cap
    # never goes below batch_size so the per-round selection (the top
    # batch_size rows by crawl order, which the kept top-job_limit set
    # always contains) — and hence the crawl order — is unchanged.
    # Gated on the knob so the default (None: disk-native frontier needs
    # no queue protection) adds zero plan nodes.
    if config.job_limit is not None:
        cap = max(config.job_limit, config.batch_size or 0)
        candidates = next_frontier.unionByName(
            spilled_in.withColumn("status", F.lit("pending")).select(*next_frontier.columns)
        )
        kept, over = select_budget(candidates, None, cap, config.salt_buckets)
        next_frontier = kept.unionByName(
            over.withColumn("status", F.lit("spilled")).select(*kept.columns)
        )

    newly_seen = crawled.select("canon_url").distinct()
    if corpus.has_redirects() and seen is not None and seen_nonempty:
        # a redirect chain can LAND on an already-seen canon (the
        # frontier's seen gate runs before redirect resolution), and
        # crawler._loop appends newly_seen without distinct ("duplicate-
        # free by construction") — keep that construction true by
        # anti-joining the round's (small) delta against seen. The
        # re-fetch itself mirrors the reference, whose bloom check also
        # guards link enqueue, not redirect landings; only the seen SET
        # must stay exact (r5 review).
        newly_seen = newly_seen.join(
            seen.select("canon_url"), "canon_url", "left_anti"
        )

    bucket = F.pmod(F.xxhash64("host"), F.lit(config.n_host_buckets)).cast("int")
    lineage = (
        crawled.withColumn("host_bucket", bucket)
        .groupBy("host_bucket")
        .agg(
            F.count(F.when(F.col("fetched") & (F.col("code") < 400), 1)).alias("fetched"),
            F.count(F.when(~F.col("fetched") | (F.col("code") >= 400), 1)).alias("failed"),
        )
        .join(
            deferred.withColumn("host_bucket", bucket)
            .groupBy("host_bucket")
            .agg(F.count("*").alias("deferred")),
            "host_bucket",
            "full_outer",
        )
        .select(
            F.lit(round_no).alias("round"),
            "host_bucket",
            F.coalesce("fetched", F.lit(0)).alias("fetched"),
            F.lit(n_deduped).cast("long").alias("deduped"),
            F.coalesce("deferred", F.lit(0)).alias("deferred"),
            F.coalesce("failed", F.lit(0)).alias("failed"),
        )
    )

    return RoundResult(
        crawled=crawled,
        newly_seen=newly_seen,
        next_frontier=next_frontier,
        lineage=lineage,
        n_selected=n_selected,
        caches=tuple(round_caches),
    )
