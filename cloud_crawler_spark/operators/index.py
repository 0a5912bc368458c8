"""Post-crawl search index: postings, TF-IDF, BM25 ranking.

The reference stops at the page store (redis_page_store.rb:29-53) —
its word_count example (examples/word_count.rb:57-75) is the closest
it gets to retrieval. A crawl corpus's first consumer is almost always
a search/ranking index, so this module provides the classic operators
over the crawled/`documents` text, shaped for 100 TB:

* the index is a FLAT ``(term, doc_id, tf)`` table, never an
  array-posting-list per term — a stopword's posting row would hold
  ~N entries and one reducer would own it. Flat postings partition by
  (term, doc_id), aggregate map-side, and bucket cleanly by term.
* corpus-level scalars (N, avgdl) ride a one-row broadcast crossJoin
  (the PageRank dangling-mass pattern) — no driver collect.
* per-doc top-k uses a row_number window partitioned by doc_id —
  fine-grained keys, no skew beyond one document's vocabulary.

Tokenization matches the engine's word_count contract (queries.py
q_word_count): lowercase, split on ``\\s+``, drop empties — keeping
every text operator on one tokenizer so counts agree across queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def postings(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Flat postings: one row per (term, doc) with term frequency."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, dl): token count per document (same tokenizer)."""
    return docs.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).cast("long").alias("dl"),
    )


def doc_freq(post: DataFrame) -> DataFrame:
    """(term, df): document frequency — postings are unique per
    (term, doc), so a plain count."""
    return post.groupBy("term").agg(F.count("*").cast("long").alias("df"))


def tfidf(docs: DataFrame, id_col: str = "doc_id",
          text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, df, tfidf) with tfidf = tf * ln(N / df).

    N arrives via a one-row broadcast crossJoin; df via an equi-join
    on term (map-side-combined aggregates on both sides)."""
    post = postings(docs, id_col, text_col)
    n = docs.agg(F.count("*").cast("double").alias("_n"))
    return (
        post.join(doc_freq(post), "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("_n") / F.col("df"))).alias("tfidf"),
        )
    )


def tfidf_topk(docs: DataFrame, k: int, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-document top-k terms by tfidf (ties broken by term asc —
    deterministic). The window partitions by doc_id: fine-grained."""
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        tfidf(docs, id_col, text_col)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def merge_postings(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental index maintenance for recurring/revisit crawls: fold
    a delta-crawl's postings into the standing index. Flat postings
    make this ONE keyed aggregation (union + groupBy sum, map-side
    combinable) — array posting lists would need per-term list surgery
    instead. Revisited (re-fetched) documents must have their OLD rows
    dropped first: pass base.join(revisited_ids, id, "left_anti")."""
    return (
        base.unionByName(delta)
        .groupBy("term", *[c for c in base.columns if c not in ("term", "tf")])
        .agg(F.sum("tf").cast("long").alias("tf"))
    )


def bm25(docs: DataFrame, query: str, k1: float = 1.2, b: float = 0.75,
         id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, score): Okapi BM25 of every matching document for a
    whitespace query, idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the
    Lucene form — always positive).

    The query term set is a broadcast semi-join (a query is tiny);
    N/avgdl ride one broadcast row; the score is one groupBy(doc)."""
    spark = docs.sparkSession
    terms = sorted({t for t in query.lower().split() if t})
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")
    post = postings(docs, id_col, text_col)
    matched = post.join(F.broadcast(qdf), "term")
    stats = docs.agg(F.count("*").cast("double").alias("_n")).crossJoin(
        doc_lengths(docs, id_col, text_col).agg(
            F.avg("dl").alias("_avgdl")
        )
    )
    scored = (
        matched.join(doc_freq(post), "term")
        .join(doc_lengths(docs, id_col, text_col), id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("_s").alias("score"))


def positional_postings(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Positional postings: one row per token occurrence —
    (term, doc_id, pos) with pos the 0-based position in the
    empty-filtered token sequence (same tokenizer as postings()).
    The index shape phrase and proximity queries need; tf is
    ``count(*)`` away, so this strictly generalizes postings().

    Scale shape: posexplode is a narrow per-doc expansion; the table
    partitions/buckets by term exactly like the flat postings — no
    per-term array is ever materialized."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    return docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    ).select("term", id_col, F.col("pos").cast("int").alias("pos"))


def phrase_match(pos_post: DataFrame, phrase: str,
                 id_col: str = "doc_id") -> DataFrame:
    """Exact-phrase search by positional intersection: documents
    containing the token sequence ``phrase``, with occurrence counts —
    (doc_id, n_matches). The classic m-way self-join: occurrence i of
    the phrase's term t_i at position p_i joins on (doc, p_i - i), so
    a full chain shares one start position.

    Scale shape: each join leg is pre-filtered to ONE term (postings
    are term-partitioned, so each leg is a selective scan); join keys
    are (doc, start). A stopword leg is the skew risk — order legs
    rarest-first upstream (df-ordered) or salt the hot term; the join
    tree here is left-deep in phrase order for determinism."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    legs = []
    for i, t in enumerate(terms):
        legs.append(
            pos_post.where(F.col("term") == t).select(
                F.col(id_col),
                (F.col("pos") - i).cast("int").alias("_start"),
            )
        )
    joined = legs[0]
    for leg in legs[1:]:
        joined = joined.join(leg, [id_col, "_start"])
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_matches")
    )
