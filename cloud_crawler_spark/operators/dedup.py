"""Deduplication operators for web-scale training-data pipelines.

All of these are built from built-in DataFrame ops (JVM-side) so they
survive 100 TB inputs: hashing via md5/xxhash64, per-document work via
higher-order array functions, candidate generation via equi-joins on
hash buckets (shuffle on a short key, never a cross join).

Hash choice: md5 (not xxhash64) wherever an external SQL oracle must
reproduce the value — md5 is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def seq_tokens(col):
    """Lowercased whitespace tokens, empties removed, ORDER PRESERVED —
    the single definition of token boundaries every span/gram/ngram
    operator (and sampling's DSIR grams) shares; null text tokenizes
    to []. The set-semantics variant is norm_tokens."""
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), r"\s+"), lambda t: t != ""
    )


def norm_tokens(col):
    """Lowercased whitespace tokens, empties removed, first-occurrence
    set semantics via array_distinct (order-preserving)."""
    return F.array_distinct(seq_tokens(col))


# ------------------------------------------------------------ exact dedup


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate collapse: keep the min-id representative per
    identical text (hash-groupBy; the md5 key keeps the shuffle narrow
    — 32 bytes instead of the document body)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "text_hash", "n_copies")
    )


# ------------------------------------------------------------ MinHash/LSH


def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 8) -> DataFrame:
    """k-permutation MinHash over the token set.

    hash_i(tok) = md5(i || ':' || tok); signature_i = min over tokens.
    String min == lexicographic min of the hex digest — deterministic
    and reproducible in any engine with md5 (the DuckDB oracle).
    """
    toks = norm_tokens(F.col(text_col))

    # NB: a two-parameter lambda would make F.transform pass the array
    # INDEX as the second arg — use a factory to close over i safely
    def _hasher(i: int):
        return lambda t: F.md5(F.concat(F.lit(f"{i}:"), t))

    sigs = [
        F.array_min(F.transform(toks, _hasher(i))).alias(f"mh{i}") for i in range(k)
    ]
    return df.select(F.col(id_col), *sigs)


def lsh_banded(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", k: int = 8,
               bands: int = 4) -> DataFrame:
    """(id, band_id, band_key): the flat LSH index rows — `bands` rows
    per document, band_key = its band's signature slice. This is the
    PERSISTABLE form (write it partitioned/bucketed by (band_id,
    band_key)): tomorrow's delta crawl probes it with an equi-join
    instead of re-signing the whole corpus (lsh_incremental_pairs)."""
    rows_per_band = k // bands
    sig = minhash_signature(df, text_col, id_col, k)
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                    ).alias("band_key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(
        id_col, F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_key").alias("band_key")
    ).where(F.col("band_key") != "")
    # ^ empty-token documents have NULL minhashes and concat_ws would
    # fold them all into band_key "" — a spurious mega-bucket the SQL
    # oracle's NULL-propagating || never builds. No tokens => no
    # signature => no bands; exact dedup collapses empty docs anyway.


def _lsh_buckets(df: DataFrame, text_col: str, id_col: str,
                 k: int, bands: int,
                 banded: DataFrame | None = None) -> DataFrame:
    """(band_id, band_key) -> sorted id array. ONE shuffle on a 2-col
    key and one computation of the signatures, where a self equi-join
    would execute the whole MinHash pipeline twice (once per join side)
    and shuffle it both times. Pass a precomputed/persisted
    ``lsh_banded`` frame as `banded` to skip signing entirely."""
    if banded is None:
        banded = lsh_banded(df, text_col, id_col, k, bands)
    return banded.groupBy("band_id", "band_key").agg(
        F.array_sort(F.collect_list(id_col)).alias("ids")
    )


def lsh_incremental_pairs(
    base: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    max_bucket: int | None = None,
    base_banded: bool | None = None,
    delta_banded: bool | None = None,
) -> DataFrame:
    """Near-dup candidates BETWEEN a stored base corpus and a delta
    crawl — the daily-ingest shape: history is NEVER re-paired against
    itself (that work happened when history was the delta), only the
    new documents probe the index.

    `base` is either a corpus (text column -> banded here) or an
    ALREADY-PERSISTED lsh_banded index — the 100 TB path, where the
    index is written once, partitioned by (band_id, band_key), and
    each day's probe join prunes to the delta's buckets. Pass
    base_banded/delta_banded=True to declare a pre-banded side (the
    caller then owns k/bands consistency with whatever signed it);
    when left None, a side is treated as pre-banded only if its
    columns are EXACTLY (id_col, band_id, band_key) — a frame that
    merely happens to carry band columns alongside others raises
    instead of silently skipping signing.

    Returns (base_id, delta_id, band_id) — band_id = the lowest band
    where the pair collided. A document present on both sides (a
    recrawl) never pairs with itself.

    max_bucket: skip probes into base buckets larger than this —
    mega-buckets are exact-dup families that exact dedup collapses
    cheaper (same audit reasoning as lsh_candidate_pairs; count the
    skips via the returned plan's complement if needed).
    """
    def _side(df, flag, out_id, side_name):
        if flag is None:
            has_band = {"band_id", "band_key"}.issubset(set(df.columns))
            exact = sorted(df.columns) == sorted([id_col, "band_id", "band_key"])
            if has_band and not exact:
                raise ValueError(
                    f"{side_name} carries band_id/band_key among other "
                    f"columns ({df.columns}); pass {side_name}_banded="
                    "True/False explicitly instead of relying on "
                    "column-name detection"
                )
            flag = exact
        if flag:
            return df.select(
                F.col(id_col).alias(out_id), "band_id", "band_key")
        return lsh_banded(df, text_col, id_col, k, bands).select(
            F.col(id_col).alias(out_id), "band_id", "band_key")

    base_b = _side(base, base_banded, "base_id", "base")
    # pre-banded delta: signatures computed once by the caller and
    # shared with its delta-internal pair pass
    delta_b = _side(delta, delta_banded, "delta_id", "delta")
    if max_bucket is not None:
        sizes = base_b.groupBy("band_id", "band_key").agg(
            F.count("*").alias("_bn"))
        base_b = base_b.join(
            sizes.where(F.col("_bn") <= max_bucket).drop("_bn"),
            ["band_id", "band_key"],
        )
    joined = base_b.join(delta_b, ["band_id", "band_key"]).where(
        F.col("base_id") != F.col("delta_id")
    )
    return joined.groupBy("base_id", "delta_id").agg(
        F.min("band_id").cast("long").alias("band_id")
    )


def lsh_cluster_edges(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 8, bands: int = 4,
                      max_bucket: int | None = None,
                      banded: DataFrame | None = None) -> DataFrame:
    """CONNECTIVITY edges for near-dup clustering: per LSH bucket,
    consecutive pairs of the sorted id array — a PATH through the
    bucket (B-1 edges) instead of lsh_candidate_pairs' B^2/2 pair
    explosion. Connected components over these edges are IDENTICAL to
    components over all pairs (a path connects exactly what a clique
    connects), so clustering never pays the quadratic term a
    mega-bucket of exact duplicates otherwise costs — the 10^10-doc
    shape for dedup_clusters. Use lsh_candidate_pairs when the PAIRS
    themselves are the product (Jaccard verification, audit).
    max_bucket keeps lsh_candidate_pairs' cap semantics (a skipped
    bucket contributes no edges).
    """
    buckets = _lsh_buckets(df, text_col, id_col, k, bands, banded=banded)
    if max_bucket is not None:
        buckets = buckets.where(F.size("ids") <= max_bucket)
    buckets = buckets.where(F.size("ids") >= 2)
    path = F.transform(
        F.slice(F.col("ids"), 1, F.size("ids") - 1),
        lambda x, i: F.struct(
            x.alias("doc_a"),
            F.element_at(F.col("ids"), i + 2).alias("doc_b"),
        ),
    )
    return (
        buckets.select(F.explode(path).alias("p"))
        .select(F.col("p.doc_a"), F.col("p.doc_b"))
        .where(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 8, bands: int = 4,
                        max_bucket: int | None = None,
                        chunk: int = 256,
                        banded: DataFrame | None = None) -> DataFrame:
    """MinHash-LSH banding: signature split into `bands` bands of k/bands
    rows; docs sharing any band bucket become a candidate pair.
    A doc appears exactly once per band, so pairs are already distinct
    per band. Returns (doc_a, doc_b, band_id) with doc_a < doc_b
    (strict — duplicate ids never produce a self-pair).

    Pair expansion is CHUNKED: a bucket's sorted id array is cut into
    `chunk`-sized slices, each (slice_i, slice_j <= i) combination
    becomes its own row, and pairs expand array-side within a row.
    Per-operator-row memory is therefore <= chunk^2 structs no matter
    how large the bucket — a single mega-bucket (one huge duplicate
    cluster) streams through explode instead of materializing B^2/2
    pairs in one array.

    max_bucket (scale knob): a bucket of B docs still EMITS B^2/2
    pairs — giant buckets are near-certain exact-duplicate clusters
    that exact dedup (cheaper) should collapse first. At the 10^10
    design point pass e.g. max_bucket=1000 to cap the quadratic
    output; None keeps exhaustive semantics (the test/oracle setting).
    Capping DROPS those buckets' pairs — audit what was dropped with
    `lsh_overflow_buckets` (same args), don't let the cap be silent.
    """
    buckets = _lsh_buckets(df, text_col, id_col, k, bands, banded=banded)
    if max_bucket is not None:
        buckets = buckets.where(F.size("ids") <= max_bucket)
    buckets = buckets.where(F.size("ids") >= 2)

    c = F.lit(chunk)
    n_chunks = F.ceil(F.size("ids") / c).cast("int")
    # rows: one per (ci, cj) chunk-index pair with ci <= cj
    idx_pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.transform(
                F.sequence(i, n_chunks - 1),
                lambda j: F.struct(i.alias("ci"), j.alias("cj")),
            ),
        )
    )
    chunked = buckets.select(
        "band_id", "ids", F.explode(idx_pairs).alias("cp")
    ).select(
        "band_id",
        F.slice(F.col("ids"), F.col("cp.ci") * c + 1, chunk).alias("ca"),
        F.slice(F.col("ids"), F.col("cp.cj") * c + 1, chunk).alias("cb"),
        (F.col("cp.ci") == F.col("cp.cj")).alias("same"),
    )
    # same-chunk: index-based i<j pairs; cross-chunk: full ca x cb
    # (ids sorted => every ca value <= every cb value; the strict
    # doc_a < doc_b filter below drops boundary duplicates)
    same_pairs = F.flatten(
        F.transform(
            F.col("ca"),
            lambda x, i: F.transform(
                F.slice(F.col("ca"), i + 2, F.greatest(F.size("ca") - (i + 1), F.lit(0))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    cross_pairs = F.flatten(
        F.transform(
            F.col("ca"),
            lambda x: F.transform(
                F.col("cb"), lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))
            ),
        )
    )
    return (
        chunked.select(
            "band_id",
            F.explode(F.when(F.col("same"), same_pairs).otherwise(cross_pairs)).alias("p"),
        )
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"), "band_id")
        .where(F.col("doc_a") < F.col("doc_b"))
    )


def lsh_overflow_buckets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                         k: int = 8, bands: int = 4,
                         max_bucket: int = 1000) -> DataFrame:
    """Audit companion to lsh_candidate_pairs(max_bucket=...): the
    buckets whose pairs the cap DROPS, with sizes — feed these into
    exact dedup / manual review instead of losing them silently."""
    return (
        _lsh_buckets(df, text_col, id_col, k, bands)
        .where(F.size("ids") > max_bucket)
        .select("band_id", "band_key", F.size("ids").alias("n_docs"))
    )


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 8, bands: int = 4, threshold: float = 0.8) -> DataFrame:
    """Candidate pairs verified by true token-set Jaccard >= threshold."""
    pairs = lsh_candidate_pairs(df, text_col, id_col, k, bands).select("doc_a", "doc_b").distinct()
    toks = df.select(F.col(id_col), norm_tokens(F.col(text_col)).alias("toks"))
    j = (
        pairs.join(toks.withColumnRenamed(id_col, "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
        .join(toks.withColumnRenamed(id_col, "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
        .withColumn("jaccard", _jaccard(F.col("toks_a"), F.col("toks_b")))
    )
    return j.where(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def _jaccard(a, b):
    # both inputs are array_distinct'd at build (norm_tokens /
    # char_shingles), so |A ∪ B| = |A| + |B| − |A ∩ B| — one set
    # operation instead of two (array_union built a second hash set
    # per row for a number the sizes already determine)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ------------------------------------------------------- dedup clusters


def connected_components(edges: DataFrame, id_a: str = "doc_a",
                         id_b: str = "doc_b", max_iter: int | None = None,
                         algorithm: str = "label") -> DataFrame:
    """Connected components over an undirected edge list.

    algorithm="label" (default): iterative
    min-label propagation: label(x) <- min(label(x), min label among
    neighbors), repeated to fixpoint. Converges in O(graph diameter)
    rounds; near-dup clusters are dense and shallow (diameter ~ 2-4),
    so a handful of shuffle rounds even at 10^10 edges. Each round is
    one equi-join + one groupBy — both partition on the id key, so at
    cluster scale AQE reuses the exchange. Per-round localCheckpoint
    keeps the plan flat (no nested-iteration blowup).

    algorithm="star": alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC 2014) — converges in O(log n) rounds regardless of diameter,
    the right shape for chain-shaped components (URL alias chains,
    syndication chains) where label propagation's O(diameter) budget
    runs out (the r2 ADVICE case).

    Returns (id, label) where label = min id reachable; rows only for
    ids that appear in `edges` (callers fold isolated ids back in).
    """
    if algorithm == "star":
        # each algorithm gets its OWN default budget when the caller
        # leaves max_iter unset: 50 star rounds cover ~2^48 diameters,
        # 20 label rounds cover diameter-20 graphs. An explicit value
        # is honored as given.
        return connected_components_star(
            edges, id_a, id_b,
            max_iter=50 if max_iter is None else max_iter,
        )
    if max_iter is None:
        max_iter = 20
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # surfacing this matters: a silently unconverged run would
        # label one component as several (duplicates kept) with no signal
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} "
            "iterations; components wider than the iteration budget are "
            "split — raise max_iter or use algorithm='star' "
            "(O(log n) rounds, diameter-independent)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def connected_components_star(edges: DataFrame, id_a: str = "doc_a",
                              id_b: str = "doc_b",
                              max_iter: int = 50) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., SOCC 2014). Each round is two
    (groupBy + join) pairs over the current edge set; the edge set
    contracts toward a star forest in O(log n) rounds INDEPENDENT of
    component diameter — a 10^6-long alias chain finishes in ~20
    rounds where min-label propagation needs 10^6. Edge count never
    grows above the input's, every step is a keyed shuffle (no
    broadcast state, no driver collect), and per-round localCheckpoint
    keeps the plan flat, so the operator holds at 10^10 edges.

    large-star(u): every neighbor v > u re-attaches to
    m = min(neighborhood(u) + u); small-star on hi->lo oriented edges
    attaches each group's lo side (and the hi node) to the group min.
    At convergence the edge set IS the component map: (node -> min id
    of its component). Same contract as connected_components:
    returns (id, label), rows only for ids appearing in `edges`.
    """
    raw = edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    # node set INCLUDING ids that only appear in self-loops, so the
    # "rows for every id appearing in edges" contract matches the
    # label algorithm's (a self-loop-only id is its own singleton)
    all_ids = (
        raw.select(F.col("u").alias("id"))
        .unionAll(raw.select(F.col("v").alias("id")))
        .where(F.col("id").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        raw.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _is_star_forest(cur) -> bool:
        # BOTH conditions are required: (a) no parent is itself a
        # child, AND (b) every child has exactly one parent. (a)
        # alone passes states like {(5,1),(5,2)} — a leaf shared by
        # two stars — where another round would still merge the
        # components (each round preserves the edge set's components,
        # so a structural star forest IS the component map).
        if not (
            cur.alias("a")
            .join(cur.alias("b"), F.col("a.v") == F.col("b.u"), "left_semi")
            .isEmpty()
        ):
            return False
        return (
            cur.groupBy("u")
            .agg(F.count_distinct("v").alias("_np"))
            .where(F.col("_np") > 1)
            .isEmpty()
        )

    converged = e.isEmpty()
    for _ in range(max_iter):
        if converged:
            break
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: m(u) = min over neighborhood(u) + u; neighbors
        # strictly above u re-attach to m. Emitted rows keep hi->lo
        # orientation by construction (m <= u < v).
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over hi->lo edges: group by the hi node; its lo
        # neighbors and the hi node itself attach to the group min.
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(mins2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        converged = _is_star_forest(e)
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components_star did not converge in {max_iter} "
            "rounds; labels may be intermediate — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("label"))
    roots = (
        e.select(F.col("v").alias("id")).distinct()
        .withColumn("label", F.col("id"))
    )
    covered = labels.unionAll(roots)
    # ids touched only by self-loops: singleton components
    singles = (
        all_ids.join(covered.select("id"), "id", "left_anti")
        .withColumn("label", F.col("id"))
    )
    return covered.unionAll(singles)


def connected_components_incremental(
    labels: DataFrame,
    new_edges: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    algorithm: str = "star",
) -> DataFrame:
    """Merge a DELTA edge set into an existing component labeling
    without re-clustering the corpus: map each new edge's endpoints
    through the old labels (unseen ids pass through as themselves),
    run connected components over that QUOTIENT graph — whose size is
    O(|delta|), not O(|corpus|) — and compose the relabeling back onto
    the full label table. Because both the old and the quotient
    labelings pick the MIN id of their component, the composition
    equals a from-scratch CC over old ∪ new edges — the nightly
    dedup-index refresh shape for a 10^10-doc store, where merge cost
    must track the delta crawl, not the corpus.

    labels: (id, label) from a previous connected_components run.
    Returns the updated (id, label) covering old ids plus any new ids
    appearing in `new_edges`.
    """
    e = new_edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    la = labels.select(F.col("id").alias("a"), F.col("label").alias("_la"))
    lb = labels.select(F.col("id").alias("b"), F.col("label").alias("_lb"))
    quotient = (
        e.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("_la", F.col("a")).alias("doc_a"),
            F.coalesce("_lb", F.col("b")).alias("doc_b"),
        )
    )
    relabel = connected_components(quotient, algorithm=algorithm)
    # compose over the old table...
    remap = relabel.select(
        F.col("id").alias("label"), F.col("label").alias("_newlab")
    )
    upd = (
        labels.join(remap, "label", "left")
        .select(
            "id",
            F.coalesce(F.col("_newlab"), F.col("label")).alias("label"),
        )
    )
    # ...and cover ids first seen in the delta (quotient node = itself)
    new_ids = (
        quotient.select(F.col("doc_a").alias("id"))
        .unionAll(quotient.select(F.col("doc_b").alias("id")))
        .distinct()
        .join(labels.select("id"), "id", "left_anti")
    )
    new_rows = (
        new_ids.join(relabel, "id", "left")
        .select("id", F.coalesce("label", F.col("id")).alias("label"))
    )
    return upd.unionAll(new_rows)


def dedup_clusters(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   k: int = 8, bands: int = 4,
                   max_bucket: int | None = None,
                   max_iter: int | None = None,
                   cc_algorithm: str = "star") -> DataFrame:
    """Near-duplicate CLUSTERS: LSH candidate pairs -> connected
    components -> every document labeled with its cluster id (min doc
    id in the component; docs in no pair are singleton clusters). The
    min-id member is the retained canonical; `is_canonical=1` rows are
    the deduplicated corpus, the rest are the drop set."""
    # lsh_cluster_edges: per-bucket PATHS (B-1 edges), not all B^2/2
    # candidate pairs — components are identical (a path connects
    # exactly what a clique connects) and a mega-bucket of exact
    # duplicates costs linear edges instead of quadratic (the
    # 10^10-doc clustering shape). Path edges make component diameter
    # O(bucket size), which is WHY star contraction (O(log n) rounds)
    # is the default here — label propagation's O(diameter) budget
    # would shatter any bucket wider than its round count.
    pairs = lsh_cluster_edges(
        df, text_col, id_col, k, bands, max_bucket=max_bucket
    )
    comp = connected_components(pairs, max_iter=max_iter,
                                algorithm=cc_algorithm)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn(
            "is_canonical",
            (F.col("doc_id") == F.col("cluster_id")).cast("int"),
        )
    )


# ------------------------------------------------------------ n-gram Jaccard


def char_shingles(col, n: int = 3):
    """Distinct character n-gram shingles of a string column — built-in
    sequence+transform+substr, no UDF."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(0))),
            lambda i: col.substr(i, F.lit(n)),
        )
    )


def ngram_jaccard_consecutive(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Character n-gram shingle Jaccard between consecutive doc ids."""
    # materialize: the self-join below references this frame on BOTH
    # sides with different join keys (no exchange reuse), so without it
    # every document's shingle set is built twice — measured ~2x the
    # query's kernel cost at sf0.1. localCheckpoint (not .cache()) so
    # the ContextCleaner reclaims it once unreferenced — repeated
    # operator calls must not pin storage forever
    grams = df.select(F.col(id_col), char_shingles(F.col(text_col), n).alias("g")).localCheckpoint(eager=True)
    a = grams.select(F.col(id_col).alias("doc_a"), F.col("g").alias("g_a"))
    b = grams.select((F.col(id_col) - 1).alias("doc_a"), F.col("g").alias("g_b"),
                     F.col(id_col).alias("doc_b"))
    return a.join(b, "doc_a").select(
        "doc_a", "doc_b",
        F.round(_jaccard(F.col("g_a"), F.col("g_b")), 6).alias("ngram_jaccard"),
    )


def token_jaccard_consecutive(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Token-set Jaccard between consecutive doc ids (a cheap, fully
    SQL-expressible near-dup screen used as the oracle-checked slice of
    the n-gram/Jaccard machinery)."""
    # same self-join shape (and same localCheckpoint-not-cache
    # reasoning) as ngram_jaccard_consecutive: tokenization runs once,
    # not once per join side
    toks = df.select(F.col(id_col), norm_tokens(F.col(text_col)).alias("toks")).localCheckpoint(eager=True)
    a = toks.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("toks_a"))
    b = toks.select((F.col(id_col) - 1).alias("doc_a"), F.col("toks").alias("toks_b"),
                    F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "doc_a")
        .select("doc_a", "doc_b",
                F.round(_jaccard(F.col("toks_a"), F.col("toks_b")), 6).alias("jaccard"))
    )


# ------------------------------------------------------------ SimHash


def simhash16(col):
    """16-bit SimHash over the token set, reproducible in ANSI SQL.

    Bit j weight = sum over distinct tokens of +-1 depending on the
    j-th hex char of md5(token) (>= '8' => +1). Bit set iff weight > 0.

    Shape: ONE md5 per token (the old form ran 16 separate aggregates,
    each recomputing md5 per token — 16x the hashing for the same
    result). A single aggregate folds each token's digest into a
    16-wide weight array via zip_with; bit extraction is then pure
    arithmetic over the final array. Same bits, same oracle.
    """
    toks = norm_tokens(col)

    def _fold(acc, t):
        m = F.md5(t)  # hashed once; 16 substr reads below share it
        contrib = F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda j: F.when(
                m.substr(j, F.lit(1)).isin(*"89abcdef"), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        return F.zip_with(acc, contrib, lambda a, c: a + c)

    weights = F.aggregate(toks, F.array_repeat(F.lit(0), 16), _fold)
    powers = F.array(*[F.lit(1 << j) for j in range(16)])
    return F.aggregate(
        F.zip_with(
            weights, powers,
            lambda w, p: F.when(w > 0, p).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, b: a + b,
    )


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 2) -> DataFrame:
    """SimHash near-dup: bucket by simhash value (exact match) plus
    verify Hamming distance for half-key collisions."""
    # materialized: referenced as FOUR join sides below (lo/hi bands x
    # a/b) — without it every document's simhash evaluates four times;
    # localCheckpoint so repeated calls don't pin storage
    sh = df.select(F.col(id_col), simhash16(F.col(text_col)).alias("simhash")).localCheckpoint(eager=True)
    # two half-keys: near-dups within hamming<=2 share at least one half
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"),
                  (F.col("simhash") % 256).alias("half"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"),
                  (F.col("simhash") % 256).alias("half"))
    lo = a.join(b, "half").where(F.col("doc_a") < F.col("doc_b"))
    a2 = sh.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"),
                   (F.col("simhash") / 256).cast("int").alias("half"))
    b2 = sh.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"),
                   (F.col("simhash") / 256).cast("int").alias("half"))
    hi = a2.join(b2, "half").where(F.col("doc_a") < F.col("doc_b"))
    cand = lo.unionByName(hi).select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.where(hamming <= max_hamming).select(
        "doc_a", "doc_b", hamming.alias("hamming")
    )


# ------------------------------------------------------------ embeddings


def cosine(a, b):
    """Cosine similarity between two array<float/double> columns —
    built-in zip_with/aggregate, no Python."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_near_dups(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
                        threshold: float = 0.95, max_id: int | None = None,
                        n_tables: int = 8, planes_per_table: int = 8) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos_sim >= t).

    max_id given: bounded exact self-join — the test/oracle path
    (every pair checked, SQL-reproducible).
    max_id None (the 100 TB default): banded sign-LSH bucketing — each
    vector lands in `n_tables` buckets (one per disjoint hyperplane
    family of `planes_per_table` planes, similarity._sign_lsh_bucket),
    and pairs are generated only within (table, bucket) equi-join
    groups, NEVER via an all-pairs theta join. Precision is exact (the
    cosine filter still applies); recall at cos 0.95 is
    1 - (1 - (1 - acos(.95)/pi)^planes)^tables ~= 0.99 at the defaults
    (pinned by tests/test_dedup_similarity.py)."""
    if max_id is not None:
        base = df.where(F.col(id_col) < max_id)
        a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        sim = cosine(
            F.transform("va", lambda x: x.cast("double")),
            F.transform("vb", lambda x: x.cast("double")),
        )
        return pairs.select("id_a", "id_b", F.round(sim, 6).alias("cos_sim")).where(
            F.col("cos_sim") >= threshold
        )

    from cloud_crawler_spark.operators.similarity import _sign_lsh_bucket

    v = df.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table"),
                    _sign_lsh_bucket(
                        F.col(vec_col), planes_per_table, plane_offset=t * planes_per_table
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select("_id", "_v", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))
    a = v.select(F.col("table"), F.col("bucket"), F.col("_id").alias("id_a"),
                 F.col("_v").alias("va"))
    b = v.select(F.col("table"), F.col("bucket"), F.col("_id").alias("id_b"),
                 F.col("_v").alias("vb"))
    cand = a.join(b, ["table", "bucket"]).where(F.col("id_a") < F.col("id_b"))
    return (
        cand.select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])  # a pair may collide in several tables
    )


# --------------------------------------------------- corpus clean pass


def clean_corpus(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 min_tokens: int = 20,
                 keep_langs: tuple[str, ...] = ("en", "de", "fr", "es")) -> DataFrame:
    """C4-style training-corpus cleanup, composed from the oracled
    primitives: language gate (functions/text.lang_id) -> quality gate
    (min token count) -> exact dedup (min-id per md5) -> SimHash
    near-dup collapse (min-id per 16-bit cluster).

    Returns one row per surviving document:
    (doc_id, lang_pred, n_tokens, n_near_dups) where n_near_dups is
    the size of the survivor's simhash cluster after exact dedup.

    Scale shape: one codegen'd filter pass, then TWO keyed groupBys
    (md5 hash, simhash) — both map-side-combinable, no joins, no
    Python. Survivor attributes ride a min(struct(id, ...)) aggregate
    (id is the first struct field, so min == smallest-id row), which
    avoids a join-back per stage. At 10^10 docs each shuffle key is
    <= 32 bytes + the kept doc's attrs.
    """
    from cloud_crawler_spark.functions.text import lang_id, quality_features

    n_tokens = quality_features(F.col(text_col))[1]
    gated = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        lang_id(F.col(text_col)).alias("lang_pred"),
        n_tokens.cast("long").alias("n_tokens"),
    ).where(
        F.col("lang_pred").isin(*keep_langs) & (F.col("n_tokens") >= min_tokens)
    )
    exact = (
        gated.groupBy(F.md5("_text").alias("_h"))
        .agg(F.min(F.struct("doc_id", "_text", "lang_pred", "n_tokens")).alias("k"))
        .select("k.*")
    )
    sims = exact.select(
        "doc_id", "lang_pred", "n_tokens",
        simhash16(F.col("_text")).cast("long").alias("simhash"),
    )
    return (
        sims.groupBy("simhash")
        .agg(
            F.min(F.struct("doc_id", "lang_pred", "n_tokens")).alias("k"),
            F.count("*").alias("n_near_dups"),
        )
        .select("k.doc_id", "k.lang_pred", "k.n_tokens", "n_near_dups")
    )


# ------------------------------------------------------------ decontamination


def token_ngrams(col, n: int):
    """Consecutive (overlapping) token n-grams of a text column,
    space-joined — built-in sequence+transform+slice, no UDF. Tokens
    are lowercased whitespace splits with empties removed (NOT
    deduplicated — n-grams need the original sequence). Documents
    shorter than `n` tokens yield an empty array."""
    toks = seq_tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(df: DataFrame, benchmark: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8,
                  bench_text_col: str | None = None) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    token n-gram with an evaluation/benchmark set (the GPT-3/Pile-style
    13-gram rule, `n` configurable).

    Plan shape for 100 TB: the benchmark side is eval data — small by
    construction (thousands of docs) — so its distinct n-gram set is
    BROADCAST; the corpus side is a projection + explode + LEFT SEMI
    broadcast-hash join, i.e. a single map-side pass over the corpus
    with no shuffle of corpus data at all. The contaminated-id set
    (small) then LEFT-joins back to annotate.

    Returns df's rows plus `contaminated` (1 if any shared n-gram).
    """
    bcol = bench_text_col or text_col
    # n-grams compare as xxhash64 longs: the distinct/broadcast/join
    # all carry 8-byte keys instead of ~n-word strings (a 2^64
    # collision would flag one extra doc — negligible vs the rule's
    # own false-positive rate from natural shared phrases)
    def _grams_h(col):
        return F.transform(token_ngrams(col, n), lambda g: F.xxhash64(g))

    bench_g = (
        benchmark.select(F.explode(_grams_h(F.col(bcol))).alias("_h"))
        .distinct()
    )
    doc_g = df.select(F.col(id_col), F.explode(_grams_h(F.col(text_col))).alias("_h"))
    hit = (
        doc_g.join(F.broadcast(bench_g), "_h", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    return df.join(hit, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(0))
    )


# ------------------------------------------------------------ span dedup


def span_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               window: int = 10) -> DataFrame:
    """Span-level (line-level analogue) corpus dedup, CCNet/RefinedWeb
    style: chunk each document's token stream into NON-overlapping
    `window`-token spans, drop every span whose exact text occurs in
    more than one document, and reassemble the survivors in order.

    Plan shape for 100 TB: span doc-frequency is a groupBy on
    xxhash64(span) — an 8-byte shuffle key instead of the span string
    (the span text itself never shuffles for the frequency count); the
    keep/drop decision joins back on the same 8-byte key. Collision
    odds at 2^64 are negligible for dedup semantics (a collision
    deletes one extra span). Reassembly is one groupBy(doc) with an
    array_sort over (idx, span) structs — no window function, no
    driver state.

    Returns one row per input doc: (id, clean_text, n_spans,
    n_spans_dropped). Docs whose spans were all dropped — and docs
    with null/empty/whitespace-only text (n_spans = 0) — keep a row
    with clean_text = ''.
    """
    toks = seq_tokens(F.col(text_col))
    spans_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(F.ceil(F.size(toks) / window) - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
    )
    spans = df.select(
        F.col(id_col), F.posexplode(spans_arr).alias("_idx", "_span")
    ).where(F.col("_span") != "")
    spans = spans.withColumn("_h", F.xxhash64("_span"))
    freq = spans.groupBy("_h").agg(F.countDistinct(id_col).alias("_ndocs"))
    marked = spans.join(freq, "_h").withColumn("_keep", F.col("_ndocs") == 1)
    agg = (
        marked.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"), F.struct("_idx", "_span"))
                        )
                    ),
                    lambda s: s["_span"],
                ),
            ).alias("clean_text"),
            F.count("*").alias("n_spans"),
            F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias("n_spans_dropped"),
        )
    )
    # one row per INPUT doc: a null/empty/whitespace-only text yields
    # zero span rows above, but the contract (and any caller joining
    # the result back) needs the doc present with clean_text = ''
    return df.select(id_col).join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_spans_dropped", F.lit(0)).cast("long").alias("n_spans_dropped"),
    )


def latest_snapshot(df: DataFrame, key_col: str = "url", ts_col: str = "warc_ts",
                    tiebreak_col: str = "doc_id") -> DataFrame:
    """Cross-dump latest-wins dedup: a Common-Crawl-style corpus built
    from several crawl snapshots holds one row per (url, dump); keep
    only the newest row per key (ties broken by the unique
    tiebreak_col so the survivor is total-order deterministic).

    Plan shape for 100 TB: ONE groupBy(key) with max_by(payload
    struct, (ts, tiebreak)) — the payload rides the aggregation
    without participating in the ordering (so non-orderable payload
    columns like WARC header maps are fine), there is no window
    function (a per-key window would sort every group) and no
    join-back (the classic groupBy-max + self-join shape scans the
    corpus twice). Map-side partial max means each executor ships one
    candidate row per key per partition.
    """
    others = [c for c in df.columns if c not in (key_col, ts_col, tiebreak_col)]
    packed = F.struct(
        F.col(ts_col), F.col(tiebreak_col), *[F.col(c) for c in others]
    )
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    best = df.groupBy(key_col).agg(F.max_by(packed, order).alias("_b"))
    return best.select(
        F.col(key_col),
        F.col(f"_b.{ts_col}").alias(ts_col),
        F.col(f"_b.{tiebreak_col}").alias(tiebreak_col),
        *[F.col(f"_b.{c}").alias(c) for c in others],
    )


def priority_dedup(df: DataFrame, key_col: str = "fp",
                   rank_col: str = "source_rank",
                   tiebreak_col: str = "doc_id") -> DataFrame:
    """Cross-corpus duplicate election by SOURCE PRIORITY: when the
    same content key appears in several corpora (curated dump, fresh
    crawl, CC backfill), keep the row from the most-trusted source —
    lowest rank_col wins, ties broken by tiebreak_col (Dolma/Pile-
    style union building, where curated text beats its web mirror).

    Plan shape — latest_snapshot's, with min_by in place of max_by:
    ONE groupBy(key) with min_by(payload struct, (rank, tiebreak)),
    map-side partial, no window, no join-back.
    """
    others = [c for c in df.columns
              if c not in (key_col, rank_col, tiebreak_col)]
    packed = F.struct(
        F.col(rank_col), F.col(tiebreak_col), *[F.col(c) for c in others]
    )
    order = F.struct(F.col(rank_col), F.col(tiebreak_col))
    best = df.groupBy(key_col).agg(F.min_by(packed, order).alias("_b"))
    return best.select(
        F.col(key_col),
        F.col(f"_b.{rank_col}").alias(rank_col),
        F.col(f"_b.{tiebreak_col}").alias(tiebreak_col),
        *[F.col(f"_b.{c}").alias(c) for c in others],
    )


def intradoc_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   window: int = 10) -> DataFrame:
    """Within-document span dedup (Dolma-style repeated-paragraph
    removal, the intra-doc complement of span_dedup's cross-doc pass):
    chunk each doc into non-overlapping `window`-token spans and keep
    only each span's FIRST occurrence inside its own document,
    reassembling survivors in order.

    Plan shape: two map-side-combinable groupBys — (doc, span) ->
    min(position) picks the keeper, then one groupBy(doc) reassembles
    via array_sort over (idx, span) structs. No window function (a
    per-doc window would sort every doc's spans through one reducer
    lane), no join: the second groupBy consumes the first's output
    directly. Same output contract as span_dedup: one row per input
    doc, (id, clean_text, n_spans, n_spans_dropped).
    """
    toks = seq_tokens(F.col(text_col))
    spans_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(F.ceil(F.size(toks) / window) - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
    )
    spans = df.select(
        F.col(id_col), F.posexplode(spans_arr).alias("_idx", "_span")
    ).where(F.col("_span") != "")
    firsts = (
        spans.groupBy(id_col, "_span")
        .agg(F.min("_idx").alias("_idx"), F.count("*").alias("_occ"))
    )
    agg = firsts.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_span"))),
                lambda s: s["_span"],
            ),
        ).alias("clean_text"),
        F.sum("_occ").alias("n_spans"),
        (F.sum("_occ") - F.count("*")).alias("n_spans_dropped"),
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_spans_dropped", F.lit(0)).cast("long").alias("n_spans_dropped"),
    )


def exact_substr_dedup(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", window: int = 8) -> DataFrame:
    """ExactSubstr-style duplicated-passage removal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"), the
    UNALIGNED complement of span_dedup: slide a `window`-token window
    over every position of every document, and drop each token that is
    covered by a window whose exact text occurs anywhere else in the
    corpus (another doc OR another offset of the same doc) — keeping
    the globally first occurrence (min (doc_id, pos)) intact. Unlike
    span_dedup's non-overlapping chunks, this catches a passage that
    starts at offset 7 in one doc and offset 123 in another. The
    suffix-array of the paper collapses to a distributed equivalent:
    every length-`window` substring is a key in one hash aggregation.

    Plan shape for 100 TB: the exploded window rows carry ONLY
    (id, int pos, xxhash64) — the window text is hashed inside the
    per-row transform() and never leaves the scan stage, so the
    frequency groupBy shuffles 8-byte keys, ~n rows per n-token doc.
    Window identity IS the 64-bit hash (same tradeoff as span_dedup):
    a birthday collision falsely marks a unique window duplicated and
    deletes its tokens — negligible below ~10^9 windows, but at 10^13
    windows expect millions of colliding pairs; at that scale widen
    the key to (xxhash64(span), xxhash64(reverse(span))) or
    (hash, length). Lee et al.'s suffix array is exact by construction.
    First-occurrence election is min(struct(id, pos)) inside the same
    aggregation (map-side combinable, no window function). Duplicate
    starts fold back per doc as one sorted int array; the keep mask and
    text reassembly are per-row codegen expressions (exists() over the
    doc's own duplicate starts — m is small for real corpora). No
    driver state, no all-pairs.

    Returns one row per input doc: (id, clean_text, n_tokens,
    n_dropped). Docs shorter than `window` tokens have no windows and
    are returned whole (whitespace-normalized, lowercased — same token
    normalization as the other span operators).
    """
    k = window
    toks = seq_tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_t"))
    starts = F.when(
        F.size("_t") >= k, F.sequence(F.lit(0), F.size("_t") - k)
    ).otherwise(F.array().cast("array<int>"))
    wins = base.select(
        id_col,
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice("_t", i + 1, k))),
            )
        ).alias("_pos", "_h"),
    )
    occ = wins.groupBy("_h").agg(
        F.count("*").alias("_n"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("_pos").alias("p"))).alias(
            "_first"
        ),
    )
    dup = (
        wins.join(occ, "_h")
        .where(
            (F.col("_n") >= 2)
            & ~(
                (F.col(id_col) == F.col("_first.d"))
                & (F.col("_pos") == F.col("_first.p"))
            )
        )
        .select(id_col, "_pos")
    )
    dupstarts = dup.groupBy(id_col).agg(
        F.array_sort(F.collect_list("_pos")).alias("_ds")
    )
    ds = F.coalesce(F.col("_ds"), F.array().cast("array<int>"))
    idx = F.when(
        F.size("_t") > 0, F.sequence(F.lit(0), F.size("_t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(
        idx, lambda j: ~F.exists(ds, lambda s: (j >= s) & (j < s + k))
    )
    # `kept` (the O(n*m) coverage scan) is projected ONCE and the two
    # consumers read the materialized column — referencing the
    # expression twice in one select would evaluate it twice per row
    return (
        base.join(dupstarts, id_col, "left")
        .select(F.col(id_col), F.col("_t"), kept.alias("_kept"))
        .select(
            F.col(id_col),
            F.concat_ws(
                " ", F.transform("_kept", lambda j: F.element_at("_t", j + 1))
            ).alias("clean_text"),
            F.size("_t").cast("long").alias("n_tokens"),
            (F.size("_t") - F.size("_kept")).cast("long").alias("n_dropped"),
        )
    )


def token_containment_consecutive(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    containment_threshold: float = 0.9,
) -> DataFrame:
    """Asymmetric near-dup screen: token-set CONTAINMENT alongside
    Jaccard for consecutive doc ids. Containment(A in B) =
    |A ∩ B| / |A| catches what Jaccard structurally cannot — a short
    document wholly embedded in a longer one (syndicated articles
    with added commentary, quoted posts, page + surrounding portal
    chrome): Jaccard dilutes toward |A|/|B| while containment stays
    1.0. `superset_dup` flags exactly those pairs (containment over
    threshold, Jaccard under — the symmetric dedup would MISS them).

    Same oracle-checked-slice shape as token_jaccard_consecutive:
    tokenization runs once behind a localCheckpoint, the pairing is
    one equi-join on adjacent ids. In production the same columns
    drop onto lsh_candidate_pairs output instead of the id-adjacency.
    """
    toks = df.select(
        F.col(id_col), norm_tokens(F.col(text_col)).alias("toks")
    ).localCheckpoint(eager=True)
    a = toks.select(F.col(id_col).alias("doc_a"),
                    F.col("toks").alias("toks_a"))
    b = toks.select((F.col(id_col) - 1).alias("doc_a"),
                    F.col("toks").alias("toks_b"),
                    F.col(id_col).alias("doc_b"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    c_a = F.when(F.size("toks_a") > 0,
                 inter / F.size("toks_a")).otherwise(F.lit(0.0))
    c_b = F.when(F.size("toks_b") > 0,
                 inter / F.size("toks_b")).otherwise(F.lit(0.0))
    jac = _jaccard(F.col("toks_a"), F.col("toks_b"))
    return a.join(b, "doc_a").select(
        "doc_a", "doc_b",
        F.round(jac, 6).alias("jaccard"),
        F.round(c_a, 6).alias("containment_a"),
        F.round(c_b, 6).alias("containment_b"),
        (
            (F.round(F.greatest(c_a, c_b), 6) >= containment_threshold)
            & (F.round(jac, 6) < jaccard_threshold)
        ).cast("long").alias("superset_dup"),
    )


def sorted_neighborhood(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """Sorted-neighborhood near-dup blocking (Hernandez & Stolfo,
    SIGMOD 1995 merge/purge) — the third candidate-generation family
    next to LSH banding and half-key SimHash bucketing: sort the
    corpus by a similarity-preserving key (the 16-bit SimHash; near
    identical texts get equal or close keys), then compare each doc
    only against its `window - 1` successors in sort order. Catches
    near-key neighbors that EXACT-bucket blocking splits across
    bucket boundaries, with linear candidate count (n * (window-1))
    instead of per-bucket quadratics.

    Returns (doc_a, doc_b, hamming) for in-window pairs with SimHash
    Hamming distance <= max_hamming, doc_a ranked before doc_b.

    Scale shape: the global sort rank comes from with_global_rank's
    range-partition prefix sum (NO single-partition window above its
    small-input cutoff); each slim (id, key, rank) row explodes into
    window-1 offset probes that meet their successor on a plain
    rank equi-join — shuffle volume is (window-1) * 24-byte rows,
    independent of document width. Hamming is codegen bit_count(xor).
    """
    from cloud_crawler_spark.operators.rank import with_global_rank

    # materialize the SimHash before ranking: with_global_rank's range
    # machinery evaluates its input several times (sampling pass, size
    # census, final shuffle) — without this the 200k-md5 key expression
    # runs ~3x (measured 14.4s -> 6.2s solo at sf0.1)
    keyed = df.select(
        F.col(id_col).alias("_id"), simhash16(F.col(text_col)).alias("_sh")
    ).localCheckpoint(eager=True)
    ranked = with_global_rank(
        keyed, [F.col("_sh").asc(), F.col("_id").asc()], rank_col="_rn"
    ).localCheckpoint(eager=True)
    probes = ranked.select(
        F.col("_id").alias("doc_a"),
        F.col("_sh").alias("_sh_a"),
        F.col("_rn"),
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("_k"),
    ).select(
        "doc_a", "_sh_a", (F.col("_rn") + F.col("_k")).alias("_rn_b")
    )
    succ = ranked.select(
        F.col("_id").alias("doc_b"),
        F.col("_sh").alias("_sh_b"),
        F.col("_rn").alias("_rn_b"),
    )
    return (
        probes.join(succ, "_rn_b")
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("_sh_a").bitwiseXOR(F.col("_sh_b"))
            ).cast("long"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
