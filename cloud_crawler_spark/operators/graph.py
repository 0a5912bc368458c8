"""Post-crawl graph analysis over the stored pages table.

Re-expresses the reference's dormant-but-documented PageStore analysis
stage: `shortest_paths!` (spec/redis_page_store_spec.rb:122-145,
page.rb:47-50 — `visited` marks reachability in shortest_paths!, and
`depth` "is not necessarily the shortest path; use
PageStore#shortest_paths! to find that value"). Crawl-time depth is
first-DISCOVERY depth; this operator recomputes true min-hop distance
from any root over the stored link graph.

Semantics pinned by the reference spec: a redirect hop costs 0 (page 1
redirects to 2 and both land at depth 1 in the spec), a link hop costs
1 — i.e. 0/1-BFS, which the loop implements as a bounded 0-cost
redirect closure inside each unit-cost level, exactly like the crawl
round resolves redirect chains within a round.

Scale shape: each level is one equi-join frontier x edges + one
anti-join vs the settled set — both shuffle on canon_url, the same key
end to end, so AQE reuses the exchange; per-level localCheckpoint
keeps the plan flat. Levels = graph eccentricity of the root, the same
BSP round structure as the crawl itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_crawler_spark.functions.canon import absolutize_udf, canonicalize, with_canon


def link_edges_of(crawled: DataFrame) -> DataFrame:
    """Distinct (src, dst) canon-URL link edges of a stored crawl.

    Stored links are document-order raw hrefs (P2 keeps them as
    extracted); resolve each against its page URL like the crawl's
    link expansion does (base-tag info is not stored, so a rare
    <base>-relative link may resolve differently than at crawl time).
    """
    return (
        with_canon(
            crawled.select(
                F.col("canon_url").alias("src"),
                F.explode("links").alias("href"),
                F.col("url").alias("page_url"),
            ).withColumn(
                "url",
                absolutize_udf(
                    F.col("href"), F.col("page_url"), F.lit(None).cast("string")
                ),
            ),
            "url",
        )
        .where(F.col("canon_url").isNotNull())
        .select("src", F.col("canon_url").alias("dst"))
        .distinct()
    )


def pagerank(
    crawled: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a stored crawl's link graph —
    the post-crawl analysis companion of ``shortest_paths`` (SURVEY
    §2.10): which stored pages matter, for seed re-prioritization of
    the next crawl (the reference's PageStore is where its README
    floats "page rank" analysis; no implementation exists there, so
    semantics are the standard power iteration).

    Returns (canon_url, rank double) for every stored page; ranks sum
    to 1 (dangling mass redistributed uniformly each step).

    init_ranks (canon_url, rank): warm-start vector — see
    pagerank_on_edges; the incremental recompute path after a delta
    crawl adds edges to an already-ranked store.

    Scale shape: the edge set is built once (distinct + checkpoint);
    every iteration is ONE equi-join ranks⋈edges shuffling on src and
    ONE groupBy dst — both map-side-combinable, no driver collect (the
    dangling-mass scalar rides a 1-row crossJoin, so the whole
    iteration stays a distributed plan). Fixed small iteration count =
    bounded BSP rounds, same envelope as the crawl itself.
    """
    nodes = crawled.select(F.col("canon_url").alias("id")).distinct()
    edges = link_edges_of(crawled)
    # rank only flows along edges between STORED pages (dst outside the
    # store would leak mass to nodes the report never shows)
    # NB: the name-form join moves the join key to column 0 — restore
    # (src, dst) order before the positional edge contract below
    edges = edges.join(
        nodes.withColumnRenamed("id", "dst"), "dst", "left_semi"
    ).select("src", "dst")
    return pagerank_on_edges(nodes, edges, iterations=iterations,
                             damping=damping, init_ranks=init_ranks)


def pagerank_on_edges(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Power-iteration core over explicit (id) nodes and (src, dst)
    edges. ``init_ranks`` (canon_url, rank) warm-starts the iteration
    — the INCREMENTAL recompute shape for a 10^10-page store: after a
    delta crawl adds/changes a fraction of edges, restarting from the
    previous snapshot's converged ranks reaches tolerance in 1-2
    iterations instead of a full cold ladder, so the nightly rank
    refresh costs O(delta-adjusted iterations), not O(cold start).
    Missing ids get the uniform 1/n prior; mass is renormalized to 1
    so the per-step invariant holds regardless of how stale the warm
    vector is. Same per-iteration plan as ``pagerank``."""
    nodes = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
    n = nodes.count()
    if n == 0:
        return nodes.sparkSession.createDataFrame(
            [], "canon_url string, rank double"
        )
    edges = edges.select(
        F.col(edges.columns[0]).alias("src"), F.col(edges.columns[1]).alias("dst")
    ).distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    w_edges = edges.join(deg, "src").localCheckpoint(eager=True)

    if init_ranks is not None:
        warm = init_ranks.select(
            F.col(init_ranks.columns[0]).alias("id"),
            F.col("rank").cast("double").alias("_r0"),
        )
        ranks = (
            nodes.join(warm, "id", "left")
            .select("id", F.coalesce("_r0", F.lit(1.0 / n)).alias("rank"))
        )
        total = ranks.agg(F.sum("rank")).collect()[0][0] or 1.0
        if abs(total - 1.0) > 1e-9:
            # genuinely stale/partial warm vector: renormalize so the
            # per-step mass invariant holds. Skipped inside float noise
            # of 1.0 — a no-op division there would only perturb values
            # that already form a distribution.
            ranks = ranks.select(
                "id", (F.col("rank") / F.lit(total)).alias("rank")
            )
        ranks = ranks.localCheckpoint(eager=True)
    else:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(max(0, iterations)):
        contrib = (
            ranks.join(w_edges, ranks.id == w_edges.src, "inner")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_c"))
        )
        # mass parked on dangling nodes (no out-edges) spreads uniformly
        dangling = (
            ranks.join(deg, ranks.id == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("id").alias("canon_url"), "rank")


def trustrank(
    crawled: DataFrame,
    trusted: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina, Pedersen, VLDB 2004): biased
    PageRank whose reset vector is uniform over a hand-vetted TRUSTED
    seed set instead of all pages. Trust flows out along links; spam
    farms that inflate vanilla PageRank through self-referential link
    mass get almost none, because no trusted page links into them.
    The crawl-side use is seed/host prioritization: recrawl budget
    follows trust, not raw in-degree.

    `trusted` is any one-column DataFrame of canon URLs; rows not in
    the store are ignored (trust cannot be seeded on pages we never
    fetched). Scores do NOT sum to 1 in general — mass that leaks to
    untrusted dangling regions decays, which is the intended signal.

    Scale shape: identical BSP envelope to `pagerank` — per iteration
    ONE ranks⋈edges equi-join + ONE groupBy(dst), dangling mass as a
    1-row broadcast crossJoin re-seeded into the trust vector, per
    iteration localCheckpoint. The trust vector is a column on the
    nodes table, not driver state.
    """
    nodes = crawled.select(F.col("canon_url").alias("id")).distinct()
    tr = (
        trusted.select(F.col(trusted.columns[0]).alias("id"))
        .distinct()
        .join(nodes, "id", "left_semi")
    )
    n_t = tr.count()
    if n_t == 0:
        return crawled.sparkSession.createDataFrame(
            [], "canon_url string, rank double"
        )
    d = (
        nodes.join(tr.withColumn("_dv", F.lit(1.0 / n_t)), "id", "left")
        .select("id", F.coalesce("_dv", F.lit(0.0)).alias("_dv"))
        .localCheckpoint(eager=True)
    )
    edges = link_edges_of(crawled)
    edges = edges.join(nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    w_edges = edges.join(deg, "src").localCheckpoint(eager=True)

    ranks = d.select("id", F.col("_dv").alias("rank"))
    for _ in range(max(0, iterations)):
        contrib = (
            ranks.join(w_edges, ranks.id == w_edges.src, "inner")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_c"))
        )
        dangling = (
            ranks.join(deg, ranks.id == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            d.join(contrib, d.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("_dv")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dm") * F.col("_dv")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("id").alias("canon_url"), "rank")


def hits(crawled: DataFrame, iterations: int = 2) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs & authorities) over a
    stored crawl's link graph — PageRank's companion for the seed
    re-prioritization analysis stage (SURVEY §2.10): hubs are the
    index/listing pages a crawler should revisit to find new content,
    authorities the content pages worth ranking.

    Per iteration: a(v) = Σ h(u) over edges (u,v), then h(u) = Σ a(v),
    each L1-normalized. Returns (canon_url, authority double,
    hub double) for every stored page (0.0 for pages outside the edge
    set); both columns sum to 1.

    Scale shape: identical to pagerank — the edge set is built once
    and checkpointed; each half-step is ONE equi-join + ONE
    map-side-combinable groupBy, and the normalizing scalar rides a
    1-row broadcast crossJoin, never the driver.
    """
    nodes = crawled.select(F.col("canon_url").alias("id")).distinct()
    if nodes.isEmpty():
        return crawled.sparkSession.createDataFrame(
            [], "canon_url string, authority double, hub double"
        )
    edges = link_edges_of(crawled)
    edges = edges.join(
        nodes.withColumnRenamed("id", "dst"), "dst", "left_semi"
    ).localCheckpoint(eager=True)

    hubs = nodes.select(F.col("id"), F.lit(1.0).alias("v"))

    def _norm(scores: DataFrame) -> DataFrame:
        tot = scores.agg(F.sum("v").alias("_t"))
        return (
            scores.crossJoin(F.broadcast(tot))
            .select("id", (F.col("v") / F.col("_t")).alias("v"))
        )

    auth = None
    for _ in range(max(1, iterations)):
        auth = _norm(
            edges.join(hubs, edges.src == hubs.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("v").alias("v"))
        ).localCheckpoint(eager=True)
        hubs = _norm(
            edges.join(auth, edges.dst == auth.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("v").alias("v"))
        ).localCheckpoint(eager=True)
    return (
        nodes.join(auth.withColumnRenamed("v", "authority"), "id", "left")
        .join(hubs.withColumnRenamed("v", "hub"), "id", "left")
        .select(
            F.col("id").alias("canon_url"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )


def spam_mass(
    crawled: DataFrame,
    trusted: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Spam-mass estimation (Gyongyi, Berkhin, Garcia-Molina,
    Pedersen: *Link spam detection based on mass estimation*, VLDB
    2006): how much of a page's PageRank is NOT explainable by the
    trusted good core. The good-core contribution is estimated as the
    trust-biased PageRank rescaled to vanilla reset mass —
    ``core = trustrank * n_trusted / n`` — so

        spam_mass      = rank - core
        rel_spam_mass  = (rank - core) / rank

    Pages whose rank is mostly self-referential link mass (farms) get
    rel_spam_mass → 1; pages fed by the trusted core get → 0 (negative
    values mean MORE trust-reachable than rank — the paper keeps them,
    so do we). The crawl-side use is the demotion twin of trustrank's
    promotion: recrawl budget and index admission gate on rel mass.

    Returns (canon_url, rank double, core double, spam_mass double,
    rel_spam_mass double). rank carries PageRank's (1-d)/n floor, so
    the ratio never divides by zero.

    Scale shape: pure composition — two BSP rank computations (each
    ONE join + ONE groupBy per iteration, see pagerank/trustrank) and
    a final 1:1 equi-join on canon_url. Driver scalars: the two node
    counts only.
    """
    nodes = crawled.select(F.col("canon_url").alias("id")).distinct()
    n = nodes.count()
    if n == 0:
        return crawled.sparkSession.createDataFrame(
            [], "canon_url string, rank double, core double, "
                "spam_mass double, rel_spam_mass double"
        )
    n_t = (
        trusted.select(F.col(trusted.columns[0]).alias("id"))
        .distinct()
        .join(nodes, "id", "left_semi")
        .count()
    )
    pr = pagerank(crawled, iterations=iterations, damping=damping)
    tr = trustrank(crawled, trusted, iterations=iterations, damping=damping)
    scale = float(n_t) / float(n)
    core = F.coalesce(F.col("trust"), F.lit(0.0)) * F.lit(scale)
    return (
        pr.join(
            tr.withColumnRenamed("rank", "trust"), "canon_url", "left"
        )
        .select(
            "canon_url",
            "rank",
            core.alias("core"),
            (F.col("rank") - core).alias("spam_mass"),
            ((F.col("rank") - core) / F.col("rank")).alias("rel_spam_mass"),
        )
    )


def salsa(crawled: DataFrame, iterations: int = 2) -> DataFrame:
    """Fixed-iteration SALSA (Lempel & Moran 2000) over a stored
    crawl's link graph — the degree-normalized sibling of hits():
    instead of summing raw neighbor scores, each half-step is a random
    walk step, so one high-out-degree hub cannot dominate the way the
    tightly-knit-community (TKC) effect lets it in HITS. The authority
    chain alternates back along a uniform in-link then forward along a
    uniform out-link:

        h(u) = Σ_{(u,v)∈E} a(v) / indeg(v)
        a(w) = Σ_{(u,w)∈E} h(u) / outdeg(u)

    a₀ is uniform over authorities (nodes with indeg ≥ 1). Both score
    vectors stay L1-normalized by construction (each half-step is a
    stochastic-matrix multiply), so unlike hits() there is no
    normalization scalar at all — no crossJoin, no driver agg.

    Returns (canon_url, authority double, hub double) for every stored
    page, 0.0 outside the edge set.

    Scale shape: degrees are joined onto the edge table ONCE and the
    widened edge set checkpointed; each half-step is then ONE equi-join
    + ONE map-side-combinable groupBy, same as pagerank/hits. The only
    driver scalar is the authority count (one long).
    """
    nodes = crawled.select(F.col("canon_url").alias("id")).distinct()
    if nodes.isEmpty():
        return crawled.sparkSession.createDataFrame(
            [], "canon_url string, authority double, hub double"
        )
    edges = link_edges_of(crawled).join(
        nodes.withColumnRenamed("id", "dst"), "dst", "left_semi"
    )
    indeg = edges.groupBy("dst").agg(F.count("*").cast("double").alias("din"))
    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("dout"))
    e = (
        edges.join(indeg, "dst")
        .join(outdeg, "src")
        .select("src", "dst", "din", "dout")
        .localCheckpoint(eager=True)
    )
    n_auth = e.select("dst").distinct().count()
    if n_auth == 0:
        return nodes.select(
            F.col("id").alias("canon_url"),
            F.lit(0.0).alias("authority"),
            F.lit(0.0).alias("hub"),
        )
    auth = (
        e.select("dst").distinct()
        .select(F.col("dst").alias("id"), F.lit(1.0 / n_auth).alias("v"))
    )
    hubs = None
    for _ in range(max(1, iterations)):
        hubs = (
            e.join(auth, e.dst == auth.id)
            .select(e.src.alias("hid"), (auth.v / e.din).alias("c"))
            .groupBy(F.col("hid").alias("id"))
            .agg(F.sum("c").alias("v"))
            .localCheckpoint(eager=True)
        )
        auth = (
            e.join(hubs, e.src == hubs.id)
            .select(e.dst.alias("aid"), (hubs.v / e.dout).alias("c"))
            .groupBy(F.col("aid").alias("id"))
            .agg(F.sum("c").alias("v"))
            .localCheckpoint(eager=True)
        )
    return (
        nodes.join(auth.withColumnRenamed("v", "authority"), "id", "left")
        .join(hubs.withColumnRenamed("v", "hub"), "id", "left")
        .select(
            F.col("id").alias("canon_url"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )


def shortest_paths(
    crawled: DataFrame,
    root_url: str,
    max_depth: int = 32,
    redirect_limit: int = 5,
) -> DataFrame:
    """Single-source min-hop distances over a stored crawl.

    `crawled` needs (canon_url, links array<string>, redirect_to).
    Returns (canon_url, depth, visited) for every stored page: depth =
    min link-hops from `root_url` (redirect hops free), NULL when
    unreachable; visited = reached flag (page.rb:47).
    """
    spark = crawled.sparkSession
    link_edges = link_edges_of(crawled).localCheckpoint(eager=True)
    redir_edges = (
        with_canon(
            crawled.where(F.col("redirect_to").isNotNull()).select(
                F.col("canon_url").alias("src"), F.col("redirect_to").alias("url")
            ),
            "url",
        )
        .select("src", F.col("canon_url").alias("dst"))
        .distinct()
    )
    has_redirects = not redir_edges.isEmpty()
    if has_redirects:
        redir_edges = redir_edges.localCheckpoint(eager=True)

    root = canonicalize(root_url)
    dist = spark.createDataFrame([(root, 0)], "canon_url string, depth int")
    frontier = dist

    def _absorb(candidates: DataFrame, dist: DataFrame):
        """Settle candidate (canon_url, depth) rows not already settled
        (BFS invariant: first arrival is minimal)."""
        fresh = (
            candidates.join(dist, "canon_url", "left_anti")
            .groupBy("canon_url")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=True)
        )
        return fresh

    for _level in range(max_depth + 1):
        # 0-cost closure: follow redirect chains (bounded like the
        # crawl's redirect_limit) before paying the next link hop
        if has_redirects:
            for _hop in range(redirect_limit):
                ext = frontier.join(
                    redir_edges, frontier.canon_url == redir_edges.src
                ).select(F.col("dst").alias("canon_url"), F.col("depth"))
                fresh = _absorb(ext, dist)
                if fresh.isEmpty():
                    break
                dist = dist.unionByName(fresh)
                frontier = frontier.unionByName(fresh)
        if _level == max_depth:
            break
        nxt = frontier.join(
            link_edges, frontier.canon_url == link_edges.src
        ).select(F.col("dst").alias("canon_url"), (F.col("depth") + 1).alias("depth"))
        fresh = _absorb(nxt, dist)
        if fresh.isEmpty():
            break
        dist = dist.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh

    return (
        crawled.select("canon_url")
        .distinct()
        .join(dist, "canon_url", "left")
        .select(
            "canon_url",
            F.col("depth"),
            F.col("depth").isNotNull().alias("visited"),
        )
    )


def cocitation(
    edges: DataFrame,
    min_common: int = 1,
    max_out_degree: int = 1000,
) -> DataFrame:
    """Co-citation relatedness (Small 1973): pairs of pages cited
    together — n_common = |{s : s->a and s->b}| for a < b. The classic
    related-page / link-farm signal over a stored crawl's
    link_edges_of output.

    Scale shape: the self-join keys on src, so a hub with out-degree d
    fans out d^2/2 pairs — the quadratic hot-key hazard. Sources above
    `max_out_degree` are excluded BEFORE the join (the mirrors.py
    gate; directory/sitemap hubs carry no relatedness signal anyway).
    Distinct edges first, then one equi-join + one map-side-combinable
    groupBy. Self-join sides are aliased (qualified refs — bare names
    trip AMBIGUOUS_REFERENCE on a self-join).
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("_d"))
    kept = (
        e.join(deg, "src")
        .where(F.col("_d") <= max_out_degree)
        .select("src", "dst")
    )
    pairs = (
        kept.alias("L")
        .join(kept.alias("R"), F.expr("L.src = R.src"))
        .where(F.expr("L.dst < R.dst"))
        .select(F.expr("L.dst").alias("a"), F.expr("R.dst").alias("b"))
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


def bibliographic_coupling(
    edges: DataFrame,
    min_common: int = 1,
    max_in_degree: int = 1000,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963): pairs of pages that cite
    the same targets — n_common = |{t : a->t and b->t}| for a < b.
    The forward-looking twin of cocitation (two pages linking the
    same references are about the same thing NOW, while co-citation
    needs the world to have linked them).

    Same scale gate, mirrored: the join keys on dst, so targets above
    `max_in_degree` (everyone links the homepage — pure noise) are
    excluded before the join.
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("dst").agg(F.count("*").alias("_d"))
    kept = (
        e.join(deg, "dst")
        .where(F.col("_d") <= max_in_degree)
        .select("src", "dst")
    )
    pairs = (
        kept.alias("L")
        .join(kept.alias("R"), F.expr("L.dst = R.dst"))
        .where(F.expr("L.src < R.src"))
        .select(F.expr("L.src").alias("a"), F.expr("R.src").alias("b"))
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


def opic(crawled: DataFrame, iterations: int = 3) -> DataFrame:
    """OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003), the crawl-ORDERING importance metric:
    unlike PageRank it needs no convergence before it is useful, which
    is why production crawlers greedily fetch the highest-cash page.
    This is the synchronous batch variant over a stored crawl: every
    page starts with cash 1/n and zero history; each round a page
    banks its cash into history and distributes it equally over its
    out-links (dangling cash spreads uniformly — the paper's virtual
    page, inlined). Importance after T rounds = (history + cash) /
    (T + 1), a probability vector (total cash is 1 per round, so
    banked history sums to T).

    The engine's use: feed `importance` into CrawlConfig priority in
    place of depth for importance-first frontier ordering (the
    reference's BFS order is the special case where every page weighs
    the same).

    Returns (canon_url, importance double), summing to 1.

    Scale shape: identical BSP envelope to `pagerank` — per round ONE
    equi-join cash⋈edges shuffling on src + ONE map-side-combinable
    groupBy dst; the dangling scalar rides a 1-row broadcast
    crossJoin; per-round localCheckpoint keeps the plan flat. No
    driver state, no collect.
    """
    nodes = crawled.select(F.col("canon_url").alias("id")).distinct()
    n = nodes.count()
    if n == 0:
        return crawled.sparkSession.createDataFrame(
            [], "canon_url string, importance double"
        )
    edges = link_edges_of(crawled)
    edges = edges.join(nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    w_edges = edges.join(deg, "src").localCheckpoint(eager=True)

    state = nodes.select(
        "id", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist")
    )
    for _ in range(max(0, iterations)):
        inflow = (
            state.join(w_edges, state.id == w_edges.src, "inner")
            .groupBy("dst")
            .agg(F.sum(F.col("cash") / F.col("_deg")).alias("_c"))
        )
        dangling = (
            state.join(deg, state.id == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("_dm"))
        )
        state = (
            state.join(inflow, state.id == inflow.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / n
                ).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        F.col("id").alias("canon_url"),
        ((F.col("hist") + F.col("cash")) / (iterations + 1)).alias(
            "importance"
        ),
    )


def harmonic_centrality(
    edges: DataFrame, max_depth: int = 3
) -> DataFrame:
    """Bounded-radius harmonic centrality: C(v) = sum over u != v with
    d(u, v) <= max_depth of 1 / d(u, v), shortest directed distance
    along (src, dst) edges. Harmonic centrality is THE published
    host-ranking metric for web graphs (Boldi & Vigna, "Axioms for
    Centrality", Internet Math 2014 — the ranking Common Crawl ships
    for its host-level webgraph releases); the bounded radius makes it
    exact and cheap where it carries most of its mass (1/d decays so
    fast that radius-3 captures the head of the ranking).

    Returns (dst id, n_reaching, harmonic double) — pages no in-path
    reaches within the radius are absent (centrality 0).

    Scale shape: unrolled BFS products — level k+1 = level k ⋈ edges
    on the frontier key, then ONE min-distance groupBy dedup over the
    union and ONE map-side-combinable rollup. Fan-out is bounded by
    out-degree^depth per source; at web scale run it on the HOST graph
    (the Common Crawl practice — million-node, not trillion) or swap
    the exact reach sets for HyperLogLog registers (HyperBall, Boldi &
    Vigna 2013) — the exact bounded form here IS the oracle-checkable
    core of that estimator.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    level = e.withColumn("d", F.lit(1))
    seen = [level]
    for k in range(2, max_depth + 1):
        level = (
            level.alias("L")
            .join(e.alias("E"), F.expr("L.dst = E.src"))
            .select(
                F.expr("L.src").alias("src"),
                F.expr("E.dst").alias("dst"),
                F.lit(k).alias("d"),
            )
            .localCheckpoint(eager=True)
        )
        seen.append(level)
    paths = seen[0]
    for lv in seen[1:]:
        paths = paths.unionByName(lv)
    dist = (
        paths.where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("d").alias("d"))
    )
    return dist.groupBy("dst").agg(
        F.count("*").alias("n_reaching"),
        F.sum(F.lit(1.0) / F.col("d")).alias("harmonic"),
    )


def outlink_entropy(
    edges: DataFrame,
    src_col: str = "src",
    host_col: str = "dst_host",
) -> DataFrame:
    """Per-page out-link host diversity — the classic link-farm /
    SEO-boilerplate signal (Fetterly, Manasse & Najork, "Spam, Damn
    Spam, and Statistics", WebDB 2004: spam pages show anomalous link
    host distributions): a page with hundreds of out-links
    concentrated on one or two hosts (entropy ~ 0) is a link dump; a
    navigation hub spreads across many (entropy ~ ln n_hosts).

    Input: one row per link (src page, destination host). Returns
    (src, n_links, n_hosts, entropy double) with entropy in nats via
    the exact-sum form H = ln(N) - sum(c*ln c)/N over per-host counts
    c (the char_entropy discipline — one expression both engines
    evaluate identically).

    Scale shape: two chained map-side-combinable groupBys on the same
    leading key (src, host) -> (src); no join, no UDF, no explode.
    Feed `TrapGate`/mirror detection with the low-entropy high-count
    tail, or demote those srcs in the frontier priority.
    """
    per_host = edges.groupBy(src_col, host_col).agg(
        F.count("*").alias("_c")
    )
    return per_host.groupBy(src_col).agg(
        F.sum("_c").alias("n_links"),
        F.count("*").alias("n_hosts"),
        (
            F.log(F.sum("_c"))
            - F.sum(F.col("_c") * F.log("_c")) / F.sum("_c")
        ).alias("entropy"),
    )


def graph_scorecard(edges: DataFrame) -> DataFrame:
    """One-row webgraph health report — the link-graph twin of
    host_concentration's corpus scorecard: node/edge counts, edge
    reciprocity (the spam/mirror tell — organic web reciprocity is
    low, link-exchange rings push it up; Serrano et al. 2007 measure
    ~0.05-0.3 on real webgraphs), and the in-degree power-law MLE
    alpha (Clauset, Shalizi & Newman 2009, continuous approximation
    at d_min=1: alpha = 1 + n / sum ln(d / 0.5) — real webgraph
    in-degrees fit alpha ~ 2.1; a graph that drifts far off is
    synthetic, truncated, or spam-inflated).

    Returns one row: (n_nodes, n_edges, reciprocity, alpha_in).

    Scale shape: distinct edges once behind a localCheckpoint, then
    four independent bounded aggregates (two plain counts, one
    self-equi-join on the reversed key pair, one groupBy(dst) fold)
    assembled with 1-row broadcast crossJoins — the PageRank
    dangling-mass pattern; nothing scales with graph size except the
    keyed shuffles themselves.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    recip = (
        e.alias("L")
        .join(
            e.alias("R"),
            F.expr("L.src = R.dst AND L.dst = R.src"),
        )
        .agg(F.count("*").alias("_n_recip"))
    )
    alpha = (
        e.groupBy("dst")
        .agg(F.count("*").alias("_d"))
        .agg(
            (
                F.lit(1.0)
                + F.count("*") / F.sum(F.log(F.col("_d") / F.lit(0.5)))
            ).alias("alpha_in")
        )
    )
    return (
        nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(recip))
        .crossJoin(F.broadcast(alpha))
        .select(
            "n_nodes",
            "n_edges",
            (F.col("_n_recip") / F.col("n_edges")).alias("reciprocity"),
            "alpha_in",
        )
    )


def label_propagation(edges: DataFrame, iterations: int = 4) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert & Kumara 2007)
    over the UNDIRECTED closure of (src, dst) — near-linear community
    detection for host graphs: mirror rings, link farms and topic
    clusters surface as shared labels where connected_components
    would lump everything reachable into one blob. Deterministic
    variant: every node starts labeled with its own id; each round
    all nodes simultaneously adopt their neighbors' most frequent
    label, ties broken by SMALLEST label (no randomness — the same
    input always yields the same communities, which is what makes an
    exact oracle possible; sync LPA can oscillate on bipartite
    structures, so treat `iterations` as a fixed budget, not a
    convergence promise).

    Returns (id, community) for every node.

    Scale shape: per round ONE equi-join labels⋈edges shuffling on
    src + ONE map-side-combinable vote groupBy + an argmax fold via
    min(struct(-count, label)) — no window over raw edges; isolated
    nodes keep their label through the left join. Per-round
    localCheckpoint keeps the plan flat (the PageRank BSP envelope).
    """
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col("src").alias("id")).distinct()
    labels = nodes.withColumn("lbl", F.col("id"))
    for _ in range(max(0, iterations)):
        votes = (
            labels.join(und, labels.id == und.src)
            .groupBy(F.col("dst").alias("_v"), "lbl")
            .agg(F.count("*").alias("_c"))
        )
        pick = votes.groupBy("_v").agg(
            F.min(F.struct((-F.col("_c")).alias("_nc"), "lbl")).alias("_m")
        )
        labels = (
            labels.join(pick, labels.id == pick._v, "left")
            .select(
                "id",
                F.coalesce(F.col("_m.lbl"), F.col("lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("id", F.col("lbl").alias("community"))


def hyperball_harmonic(
    edges: DataFrame, max_depth: int = 3, p: int = 6
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", ICDMW 2013) — the web-scale
    estimator behind `harmonic_centrality`: each node carries a
    HyperLogLog counter of its in-ball; per round every counter
    absorbs its in-neighbors' counters (register-wise max — HLL union
    is lossless), and the harmonic score accumulates
    (|ball_t| - |ball_{t-1}|) / t. Memory per node is m = 2^p
    registers instead of an exact reach set — THE trick that lets
    radius-k centrality run on trillion-edge graphs.

    Returns (id, n_reaching_est double, harmonic_est double) for
    every node. Deterministic (xxhash64 node hashing, no RNG).
    Estimates carry HLL error ~1.04/sqrt(m) (~13% at p=6); the exact
    bounded operator is the oracle-checkable twin — this one trades
    exactness for state size, pytest-pinned against it.

    Scale shape: registers live in LONG format (node, reg_idx,
    reg_val) — per round ONE equi-join states⋈edges on src and ONE
    map-side-combinable groupBy(dst, reg_idx) max; estimation is a
    groupBy(node) fold over m rows. No arrays to element-wise-max
    across rows (Spark has no such aggregate), no UDF, no driver
    state; per-round localCheckpoint (the BSP envelope). Rows per
    node = m — constant, tune p against executor memory.
    """
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # singleton-{v} registers: idx = low p bits of xxhash64, rho =
    # leading-zero count of the remaining 64-p bits + 1, computed
    # EXACTLY as (64-p) - floor(log2(w)) via length(bin(w)) integer
    # string algebra (no float log)
    h = F.xxhash64(F.col("id").cast("string"))
    idx = F.pmod(h, F.lit(m)).cast("int")
    w_sql = f"shiftrightunsigned(xxhash64(cast(id as string)), {p})"
    w = F.expr(w_sql)
    rho = F.when(w == 0, F.lit(64 - p + 1)).otherwise(
        F.lit(64 - p) - F.length(F.expr(f"bin({w_sql})")) + 1
    ).cast("int")
    grid = nodes.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("reg_idx"),
    )
    state = (
        grid.join(
            nodes.select("id", idx.alias("_i"), rho.alias("_r")), "id"
        )
        .select(
            "id",
            "reg_idx",
            F.when(F.col("reg_idx") == F.col("_i"), F.col("_r"))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("reg_val"),
        )
        .localCheckpoint(eager=True)
    )

    def _estimate(st):
        est = st.groupBy("id").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("reg_val"))).alias("_z"),
            F.sum((F.col("reg_val") == 0).cast("int")).alias("_v"),
        )
        raw = F.lit(alpha * m * m) / F.col("_z")
        lin = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_v"))
        return est.select(
            "id",
            F.when((raw <= 2.5 * m) & (F.col("_v") > 0), lin)
            .otherwise(raw)
            .alias("est"),
        )

    scores = _estimate(state).select(
        "id", F.col("est").alias("_prev"), F.lit(0.0).alias("harmonic_est")
    )
    for t in range(1, max_depth + 1):
        inbound = (
            state.join(e, state.id == e.src)
            .select(F.col("dst").alias("id"), "reg_idx", "reg_val")
        )
        state = (
            state.unionByName(inbound)
            .groupBy("id", "reg_idx")
            .agg(F.max("reg_val").alias("reg_val"))
            .localCheckpoint(eager=True)
        )
        est = _estimate(state)
        scores = (
            scores.join(est, "id")
            .select(
                "id",
                F.col("est").alias("_prev"),
                (
                    F.col("harmonic_est")
                    + F.greatest(
                        F.col("est") - F.col("_prev"), F.lit(0.0)
                    )
                    / t
                ).alias("harmonic_est"),
            )
            .localCheckpoint(eager=True)
        )
    return scores.select(
        "id",
        (F.col("_prev") - 1.0).alias("n_reaching_est"),
        "harmonic_est",
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over
    the undirected simple graph induced by ``edges`` (src, dst).

    The post-crawl link-graph twin of the reference's dormant
    PageStore analysis stage (page.rb:47-50 family): triangle density
    separates organic link neighborhoods (friends-of-friends close
    triangles) from spam farms and auto-generated chrome (star- or
    ring-shaped, near-zero clustering) — the classic webgraph signal
    alongside reciprocity/alpha in graph_scorecard.

    Scale shape (the MapReduce-folklore degree-ordered orientation,
    cf. Suri & Vassilvitskii WWW'11): symmetrize + dedupe to
    canonical undirected edges, then orient every edge from the
    endpoint with smaller (degree, id) to the larger. Out-degree
    under this orientation is O(sqrt(m)) for ANY graph, so the wedge
    self-join — the only superlinear step — never pivots through a
    hub: a 10^8-inlink host contributes wedges only via its (tiny)
    oriented out-list. Wedge closure is one more equi-join against
    the oriented edge list, all three shuffles on plain id keys.

    Returns (id, deg BIGINT, tri BIGINT, lcc DOUBLE) for every node,
    lcc = 2*tri / (deg*(deg-1)) (0.0 when deg < 2) — a single fp
    division of exact integers, so cross-engine bit-exact.
    """
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    # orient: lo -> hi by (deg, id); join degrees onto both endpoints
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("_dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("_degb"))
    oriented = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(
                (F.col("_dega") < F.col("_degb"))
                | ((F.col("_dega") == F.col("_degb")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e")
        )
        .select("e.lo", "e.hi")
        .localCheckpoint(eager=True)
    )
    # wedges at pivot lo: (lo -> u), (lo -> v) with u < v; closed iff
    # the canonical undirected edge (u, v) exists (it is oriented
    # u->v or v->u, so probe the undirected list, not the oriented one)
    w1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("u"))
    w2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("v"))
    wedges = w1.join(w2, "p").where(F.col("u") < F.col("v"))
    tris = wedges.join(
        und,
        (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")),
    ).select("p", "u", "v")
    per_node = (
        tris.select(F.explode(F.array("p", "u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("tri"))
    )
    return (
        deg.join(per_node, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
            F.when(
                F.col("deg") >= 2,
                2.0 * F.coalesce(F.col("tri"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002, Phys Rev Lett
    89:208701) of the undirected simple graph induced by ``edges``:
    the Pearson correlation of endpoint degrees across edges. Real
    webgraphs are disassortative (r < 0 — hubs link to leaves); a
    strongly assortative subgraph is the signature of a link
    exchange / mirror ring, complementing reciprocity in
    graph_scorecard.

    r = (S1*Sjk - Sj*Sk) / sqrt((S1*Sjj - Sj^2) * (S1*Skk - Sk^2))
    over DIRECTED endpoint pairs (each undirected edge contributes
    both (j,k) and (k,j), the standard symmetric treatment, which
    makes Sj = Sk and Sjj = Skk).

    Scale shape: degrees is one groupBy; moments is one edge-degree
    equi-join pair + a single map-side-combinable global agg of
    INTEGER sums (degrees are ints, so every moment is exact — the
    final r is a handful of fp ops on exact integers, cross-engine
    bit-exact). Returns one row (n_edges BIGINT, r DOUBLE).
    """
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dj"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("dk"))
    m = (
        und.join(da, "a").join(db, "b")
        .agg(
            (2 * F.count("*")).cast("long").alias("s1"),
            F.sum(F.col("dj") + F.col("dk")).cast("long").alias("sj"),
            (2 * F.sum(F.col("dj") * F.col("dk"))).cast("long").alias("sjk"),
            F.sum(
                F.col("dj") * F.col("dj") + F.col("dk") * F.col("dk")
            ).cast("long").alias("sjj"),
        )
    )
    return m.select(
        (F.col("s1") / 2).cast("long").alias("n_edges"),
        (
            (F.col("s1") * F.col("sjk") - F.col("sj") * F.col("sj"))
            / (F.col("s1") * F.col("sjj") - F.col("sj") * F.col("sj"))
        ).alias("r"),
    )


def kcore(edges: DataFrame, k: int, max_rounds: int = 40) -> DataFrame:
    """k-core of the undirected simple graph induced by ``edges``:
    iteratively peel every node whose degree in the surviving
    subgraph is < k until a fixpoint (Seidman 1983; Batagelj-Zaversnik
    peeling re-expressed as BSP rounds). On a webgraph the k-core
    isolates the densely interlinked center — link farms and true
    topical hubs — from the tendril mass that a frontier at
    10^10-URL scale mostly consists of.

    Scale shape: each round is one groupBy(deg) + two semi-joins, all
    shuffling on node id, behind a per-round localCheckpoint (the
    crawl loop's own plan-flattening discipline). Rounds needed =
    peeling depth (longest chain that unravels one layer per round),
    NOT graph size. Raises RuntimeError if not converged within
    ``max_rounds`` — silent non-convergence would return a superset
    of the core (the connected_components lesson, ADVICE r2).

    Returns (id, deg) for surviving nodes, deg = degree INSIDE the
    k-core.
    """
    cur = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("id"))
            .unionByName(cur.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("id")
        nxt = (
            cur.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == cur.count():
            return (
                nxt.select(F.col("a").alias("id"))
                .unionByName(nxt.select(F.col("b").alias("id")))
                .groupBy("id")
                .agg(F.count("*").cast("long").alias("deg"))
                .where(F.col("deg") >= k)
            )
        cur = nxt
    raise RuntimeError(
        f"kcore(k={k}) did not converge within {max_rounds} rounds"
    )


def _bounded_reach(edges: DataFrame, seed: str | int, radius: int) -> DataFrame:
    """Node ids reachable from ``seed`` in <= radius directed hops
    (seed included). One equi-join + one anti-join per level, both on
    the node-id key, per-level localCheckpoint — the crawl BFS shape."""
    spark = edges.sparkSession
    reached = spark.createDataFrame(
        [(seed,)], edges.select(F.col("src").alias("id")).schema
    ).localCheckpoint(eager=True)
    frontier = reached
    for _ in range(radius):
        nxt = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reached, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return reached


def bowtie(edges: DataFrame, seed, radius: int = 20) -> DataFrame:
    """Bounded bow-tie decomposition (Broder et al. WWW 2000) of the
    directed graph around a seed known to sit in the central SCC:
    CORE = nodes on a round-trip with the seed (forward AND backward
    reachable within ``radius``), IN = backward-only (they reach the
    core), OUT = forward-only (the core reaches them), OTHER =
    tendrils/disconnected. The radius bound is the honest scale
    story: full SCC at 10^10 nodes needs many sweeps, while the
    bow-tie *shape* stabilizes at small radius on real webgraphs
    (effective diameter ~16, Broder et al. fig. 9).

    Returns (id, component STRING) for every node of the graph.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    fwd = _bounded_reach(e, seed, radius).withColumn("_f", F.lit(1))
    bwd = _bounded_reach(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        seed,
        radius,
    ).withColumn("_b", F.lit(1))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return (
        nodes.join(fwd, "id", "left")
        .join(bwd, "id", "left")
        .select(
            "id",
            F.when(F.col("_f").isNotNull() & F.col("_b").isNotNull(), "CORE")
            .when(F.col("_b").isNotNull(), "IN")
            .when(F.col("_f").isNotNull(), "OUT")
            .otherwise("OTHER")
            .alias("component"),
        )
    )
