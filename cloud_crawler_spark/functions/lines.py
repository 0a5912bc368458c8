"""C4-style line-level corpus cleaning (Raffel et al. 2020, "Exploring
the Limits of Transfer Learning", §2.2 — the public C4 heuristics).

Per LINE of a document: keep a line only if it (a) ends in a terminal
punctuation mark, (b) has at least `min_words` words, (c) contains no
blacklisted term (default: "javascript" — the classic "please enable
javascript" chrome), and (d) contains no curly brace (code gate).
Per DOCUMENT: drop the whole page when a page-level term occurs
(default: "lorem ipsum") or fewer than `min_kept` lines survive.

The reference crawler stores full page text (`page.rb:109-113`,
`text_for`); this is the downstream curation step a training pipeline
runs on that text before tokenization.

Scale shape: everything is built-in higher-order array functions over
the line array — split / filter / array_join inside one projection.
Whole-stage codegen, per-row work only, ZERO shuffle at any scale: a
100 TB corpus cleans in one map pass. The same lambda algebra is
expressible in the DuckDB oracle (list_filter), so the gate decisions
are pinned cross-engine (q_line_filter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# terminal sentence punctuation, C4-style (period/!/?/closing quote)
TERMINAL_PUNCT_RE = '[.!?"]$'
DEFAULT_LINE_BLACKLIST = ("javascript",)
DEFAULT_DOC_TERMS = ("lorem ipsum",)


def line_word_count(line: Column) -> Column:
    """Whitespace word count of one line (empties removed)."""
    return F.size(F.filter(F.split(line, r"\s+"), lambda t: t != ""))


def keep_line(
    line: Column,
    min_words: int = 3,
    blacklist: tuple[str, ...] = DEFAULT_LINE_BLACKLIST,
    brace_gate: bool = True,
) -> Column:
    """C4 per-line keep predicate (see module docstring)."""
    cond = line.rlike(TERMINAL_PUNCT_RE) & (line_word_count(line) >= min_words)
    for term in blacklist:
        cond = cond & ~F.contains(F.lower(line), F.lit(term))
    if brace_gate:
        cond = cond & ~F.contains(line, F.lit("{"))
    return cond


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_kept: int = 3,
    blacklist: tuple[str, ...] = DEFAULT_LINE_BLACKLIST,
    doc_terms: tuple[str, ...] = DEFAULT_DOC_TERMS,
    brace_gate: bool = True,
) -> DataFrame:
    """Apply the C4 line filters; returns one row per input document:

    (id_col, n_lines, n_kept, removed_line_frac, clean_text, keep_doc)

    `clean_text` is the surviving lines re-joined with newlines in
    original order ('' when the document-level gate drops the page);
    `keep_doc` is 1/0 (page survives iff no doc-level term matches and
    at least `min_kept` lines survive).
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines, lambda l: keep_line(l, min_words, blacklist, brace_gate)
    )
    doc_bad = F.lit(False)
    for term in doc_terms:
        doc_bad = doc_bad | F.contains(F.lower(F.col(text_col)), F.lit(term))
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    keep_doc = (~doc_bad) & (n_kept >= min_kept)
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        F.round(F.lit(1) - n_kept / F.greatest(n_lines, F.lit(1)), 6).alias(
            "removed_line_frac"
        ),
        F.when(keep_doc, F.array_join(kept, "\n")).otherwise(F.lit("")).alias(
            "clean_text"
        ),
        keep_doc.cast("long").alias("keep_doc"),
    )


def strip_common_lines(
    df: DataFrame,
    min_docs: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_max_lines: int = 100_000,
    scope_col: str | None = None,
) -> DataFrame:
    """Cross-CORPUS duplicated-line removal (the RefinedWeb/CCNet
    boilerplate pass `clean_lines` cannot do): a line that appears in
    >= `min_docs` distinct documents is site chrome ("Subscribe to our
    newsletter", cookie banners, copyright footers) and is stripped
    from EVERY document; whitespace-only lines are structural and
    always kept. Returns (id_col, text_clean, n_lines, n_kept) with
    surviving lines re-joined in original order — one row per input
    document, even when everything was stripped (text_clean = '').

    Scale shape: posexplode -> groupBy(line) count_distinct(doc) is
    map-side combinable; the strip is a LEFT ANTI join of the exploded
    lines against only the COMMON lines — a set that is tiny by
    construction (boilerplate is few distinct strings at huge
    frequency), so it broadcasts (count-gated at
    `broadcast_max_lines`, shuffle anti-join past it) and the hot
    keys never shuffle. Reassembly is one groupBy(doc) over
    sort_array(collect_list(struct(pos, line))).

    With `scope_col` (e.g. host) the pass becomes the RefinedWeb
    WITHIN-SITE chrome strip: a line must repeat across `min_docs`
    documents OF THE SAME SCOPE to be stripped there — one site's
    banner never bleeds into another's counting, and a globally-rare
    line that happens to be one host's boilerplate is still caught.
    Counting keys and the anti-join become (scope, line); the shape
    is otherwise identical.
    """
    scope = [scope_col] if scope_col else []
    lines = df.select(
        F.col(id_col),
        *[F.col(c) for c in scope],
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    candidates = lines.where(F.trim(F.col("line")) != "")
    common = (
        candidates.groupBy(*scope, "line")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select(*scope, "line")
    )
    n_common = common.count()
    if n_common <= broadcast_max_lines:
        common = F.broadcast(common)
    kept = lines.where(F.trim(F.col("line")) == "").unionByName(
        candidates.join(common, [*scope, "line"], "left_anti")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.count("*").cast("long").alias("n_kept"),
    )
    return (
        df.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
        )
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )
