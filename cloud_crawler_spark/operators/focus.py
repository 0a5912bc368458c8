"""Focused-crawl frontier scoring.

Shark-search (Hersovici et al., WWW7 1998) is the classic best-first
focused crawler: a child URL inherits a decayed share of its parent
page's topical relevance, plus the relevance of the anchor text that
points at it. The reference's ``focus_crawl`` DSL hook
(dsl_core.rb focus_crawl / count_listings.rb:30-34) gates WHICH links
enter the frontier; this operator supplies the complementary signal —
in what ORDER a topic-driven crawl should fetch them — as a priority
column the frontier's (priority, depth, host-budget) ordering already
consumes.

Everything is whole-stage-codegen column algebra (split /
array_distinct / array_intersect) — no UDF, no driver state — so the
scoring pass is one projection + one groupBy at any scale.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _topic_overlap(col, topic_lit, k: float):
    """|distinct tokens(col) ∩ topic| / |topic| — exact dyadic doubles
    when |topic| is a power of two, so cross-engine hashes are bit-safe
    without ppm rounding."""
    toks = F.array_distinct(
        F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")
    )
    return F.size(F.array_intersect(toks, topic_lit)) / F.lit(k)


def shark_priorities(
    pages: DataFrame,
    edges: DataFrame,
    topic_terms,
    decay: float = 0.5,
) -> DataFrame:
    """Score candidate child URLs for a topic-focused crawl.

    pages: (id, text) — fetched pages with extracted text.
    edges: (src, dst, anchor) — outlinks with their anchor text
    (the parser's collect_anchors map provides anchors at crawl time).
    topic_terms: iterable of topic keywords (case-insensitive).

    Per edge: score = decay * relevance(src text) +
    (1 - decay) * relevance(anchor), where relevance is the fraction
    of topic terms present among the text's distinct tokens. Per child:
    priority = MAX over in-edges (best parent wins — shark-search's
    inheritance rule), n_inlinks = supporting edge count.

    Returns (dst, priority double, n_inlinks bigint). Feed the result
    into the frontier as its priority column (lower sorts first in the
    crawl's ordering, so callers negate or rescale as configured).

    Scale shape: the topic list is a tiny literal array living inside
    codegen (no join); the only shuffles are the edges⋈pages equi-join
    on src and ONE map-side-combinable groupBy(dst) — the same
    envelope as the host-graph rollup.
    """
    topic = sorted({t.lower() for t in topic_terms})
    if not topic:
        raise ValueError("topic_terms must be non-empty")
    k = float(len(topic))
    tlit = F.array(*[F.lit(t) for t in topic])
    rel = pages.select(
        F.col("id").alias("src"),
        _topic_overlap(F.col("text"), tlit, k).alias("rel"),
    )
    scored = edges.join(rel, "src", "left").select(
        "dst",
        (
            F.lit(float(decay)) * F.coalesce(F.col("rel"), F.lit(0.0))
            + F.lit(1.0 - float(decay))
            * F.coalesce(
                _topic_overlap(F.col("anchor"), tlit, k), F.lit(0.0)
            )
        ).alias("p"),
    )
    return scored.groupBy("dst").agg(
        F.max("p").alias("priority"),
        F.count("*").cast("long").alias("n_inlinks"),
    )
