"""Training sequence packing: greedy fixed-length bin packing of
documents into model-context-sized sequences.

LLM pretraining consumes fixed-length token sequences; feeding one
short document per sequence wastes the context window, so pipelines
*pack* — concatenate documents into bins of ``seq_len`` tokens
(GPT/T5 "example packing"). The packing itself is inherently
sequential (bin state depends on every earlier document), so the
scalable shape is: deterministically bucket the corpus, then run the
linear greedy scan *per bucket* with applyInPandas — each bucket is an
independent, memory-bounded pandas group, and the bucket count scales
with the cluster. Token counting stays JVM-side; only the integer
(id, n_tokens) pairs cross into Arrow, never the text.

Packing rule (first-fit in id order within a bucket — deterministic,
and exactly reproducible by the DuckDB oracle's recursive CTE):
  * a document fits an open bin iff fill + n_tokens <= seq_len;
  * otherwise it opens the next bin at offset 0;
  * a document longer than seq_len gets (the front of) its own bin
    with truncated = true — fill saturates at seq_len so nothing
    packs after it.

At 100 TB: the only shuffle is the bucket repartition (key = id %
n_buckets, uniform by construction — no skew); within a bucket the
scan is O(rows) with O(1) state. n_buckets is the parallelism knob;
raise it with the cluster.

Reference anchor: out of the reference's scope (2013 crawler); part of
the training-data-pipeline surface the brief adds.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloud_crawler_spark.functions import text as TX

PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("tok_offset", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("truncated", T.BooleanType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 64,
    n_buckets: int = 16,
) -> DataFrame:
    """Assign every document a (bucket, bin_id, tok_offset) packing
    slot; see module docstring for the rule. Output columns:
    (doc_id, bucket, bin_id, tok_offset, n_tokens, truncated)."""
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) % n_buckets).cast("long").alias("bucket"),
        # NULL text packs as an empty (0-token) doc, not a NaN that
        # blows up int() in the pandas scan
        F.coalesce(TX.token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill = -1, seq_len + 1  # force first row to open bin 0
        bins, offs, truncs = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill + n <= seq_len:
                offs.append(fill)
                fill += n
            else:
                bin_id += 1
                offs.append(0)
                fill = min(n, seq_len)
            bins.append(bin_id)
            truncs.append(n > seq_len)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["tok_offset"] = pd.Series(offs, dtype="int64")
        pdf["truncated"] = truncs
        return pdf[
            ["doc_id", "bucket", "bin_id", "tok_offset", "n_tokens", "truncated"]
        ]

    return base.repartition(n_buckets, "bucket").groupBy("bucket").applyInPandas(
        _pack, PACK_SCHEMA
    )


def packing_stats(packed: DataFrame, seq_len: int = 64) -> DataFrame:
    """Per-bucket packing efficiency rollup over pack_sequences output:
    (bucket, n_docs, n_bins, fill_rate round 6). fill_rate counts
    tokens actually placed (truncated docs contribute the seq_len
    prefix that was kept)."""
    placed = F.least(F.col("n_tokens"), F.lit(seq_len))
    return (
        packed.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.max("bin_id") + 1).cast("long").alias("n_bins"),
            F.round(
                F.sum(placed) / ((F.max("bin_id") + 1) * seq_len), 6
            ).alias("fill_rate"),
        )
    )


def shard_by_bytes(
    df: DataFrame,
    target_bytes: int,
    order_cols: list,
    size_col: str | None = None,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Size-targeted output sharding: assign each row a contiguous
    shard id so that shards split at ``target_bytes`` boundaries in
    the total order given by ``order_cols`` —
    ``shard = bytes_before // target_bytes`` where bytes_before is the
    exact prefix sum of row sizes. The file-layout primitive for
    writing a 100 TB corpus as uniformly-sized training shards
    (``df.repartition(shard).write...`` or partitionBy(shard)):
    readers get predictable file sizes regardless of document-length
    skew, unlike row-count repartitioning.

    The prefix sum is operators/rank.with_prefix_sum — the
    with_global_rank machinery generalized to weighted sums (no
    single-partition window; one byte-total per partition to the
    driver). order_cols must end in a per-row tiebreaker (e.g.
    doc_id). A row larger than target_bytes still gets exactly one
    shard (shards are split points, not caps).

    Adds two columns: ``shard`` and ``n_bytes`` (the measured row
    size). A pre-existing caller column named ``n_bytes`` is left
    untouched (the size is then carried in a private column and only
    ``shard`` is added); a pre-existing ``shard`` column raises.
    """
    from cloud_crawler_spark.operators.rank import with_prefix_sum

    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    if "shard" in df.columns:
        raise ValueError("input already has a 'shard' column")
    size = (
        F.col(size_col) if size_col
        else F.octet_length(F.col(text_col))
    ).cast("long")
    bytes_col = "_cc_n_bytes" if "n_bytes" in df.columns else "n_bytes"
    out = with_prefix_sum(
        df.withColumn(bytes_col, size),
        order_cols,
        weight=F.col(bytes_col),
        out_col="_before",
        num_partitions=num_partitions,
    )
    out = out.withColumn(
        "shard", F.floor(F.col("_before") / F.lit(target_bytes)).cast("long")
    ).drop("_before")
    return out.drop("_cc_n_bytes") if bytes_col == "_cc_n_bytes" else out
