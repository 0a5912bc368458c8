"""Distributed BPE tokenizer training (Sennrich et al. 2016) and
application — the tokenizer-induction step after vocab health checks
(operators/lm.vocab_coverage) and before sequence packing.

The scalable shape — and the reason this fits 100 TB — is that BPE
training NEVER iterates over the corpus: real trainers operate on the
word-frequency table, which is vocabulary-sized (millions of rows),
with each word's occurrence count as the pair weight. Here:

* one corpus pass builds (word, count) — a groupBy, map-side
  combinable;
* each merge round is (a) one JVM-side explode of adjacent symbol
  pairs weighted by count + groupBy(pair) sum, (b) a 1-row argmax
  collect (a bounded scalar, same class as the crawl's lineage
  counters — never scales with data), (c) one JVM-side F.aggregate
  that rewrites each word's symbol array left-to-right, appending or
  fusing into the accumulator — whole-stage codegen, no Python;
* the symbol table is localCheckpointed per round, so the plan depth
  stays O(1) instead of nesting one aggregate per merge (the same
  lineage-truncation discipline as the crawl rounds).

Applying the tokenizer to a corpus is a broadcast join against the
trained (word -> symbols) table — the model IS the vocab table; words
unseen at training time fall back to character symbols (documented,
deterministic).

Training is deterministic: pair argmax breaks ties by (count desc,
left asc, right asc). The merge sequence is pinned exactly against a
pure-Python reference in tests/test_bpe.py. Genuinely iterative ->
no SQL oracle (the driver records the weaker rows-only check for
q_bpe_merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_crawler_spark.functions.text import tokens


def _char_syms(col):
    """Word -> array of single-character symbols (JVM split)."""
    return F.filter(F.split(col, ""), lambda c: c != "")


def _merge_expr(syms, left: str, right: str):
    """Rewrite one symbol array, fusing non-overlapping (left, right)
    adjacencies left-to-right: fold each symbol into an accumulator,
    fusing when the accumulator tail is `left` and the incoming symbol
    is `right`. Overlap is impossible by construction — a fused tail
    becomes left||right, which no longer equals `left` (symbols are
    non-empty). Pure F.aggregate: codegen, no Python."""
    fused = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over lowercased whitespace tokens — the ONLY
    corpus-wide pass in BPE training."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Learn `n_merges` BPE merges from the corpus. Returns
    (merges, vocab):
      merges: (rank, left, right, pair_count) — the ordered merge list
      vocab:  (word, n, syms array<string>) — each trained word's final
              symbolization (the model applied by bpe_tokenize)
    Stops early when the best remaining pair occurs < min_count times
    (weighted by word frequency)."""
    spark = df.sparkSession
    vocab = word_counts(df, text_col).withColumn(
        "syms", _char_syms(F.col("word"))
    ).localCheckpoint(eager=True)

    merges = []
    for rank in range(n_merges):
        pairs = vocab.select(
            F.col("n"),
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()  # bounded: exactly one row per round
        )
        if not best or best[0]["c"] < min_count:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, l, r, c))
        vocab = vocab.withColumn(
            "syms", _merge_expr(F.col("syms"), l, r)
        ).localCheckpoint(eager=True)  # O(1) plan depth across rounds

    merges_df = spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )
    return merges_df, vocab


def bpe_tokenize(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus with a trained BPE model: explode words,
    broadcast-join the (word -> syms) table, concatenate per doc in
    word order. Unseen words fall back to character symbols (no merge
    replay — deterministic and cheap; retrain to absorb new words).
    Returns (id, bpe_tokens array<string>, n_bpe_tokens)."""
    words = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("_pos", "word"),
    )
    joined = words.join(
        F.broadcast(vocab.select("word", "syms")), "word", "left"
    ).select(
        F.col(id_col),
        "_pos",
        F.coalesce("syms", _char_syms(F.col("word"))).alias("syms"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "syms"))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("bpe_tokens")
        )
        .withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long"))
    )
