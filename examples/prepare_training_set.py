"""From curated corpus to model-ready training shards: the LAST mile
of an LLM-data pipeline, composed from this engine's oracled
operators. examples/curate_corpus.py ends with a clean, deduped,
mixture-sampled corpus; this picks up from there:

  1. Latest-snapshot collapse — multi-dump corpora keep only the
     newest row per url (operators/dedup.latest_snapshot)
  2. ExactSubstr passage dedup — drop duplicated unaligned passages,
     keep the global first occurrence (operators/dedup.exact_substr_dedup)
  3. LM quality filter        — CCNet-style bigram-LM perplexity,
     keep below a tier threshold (operators/lm.bigram_lm_score)
  4. DSIR target-domain weighting — hashed-ngram importance weights
     against a target slice, keep the top half
     (operators/sampling.dsir_weights)
  5. Mixture rebalance        — integer-exact per-language rates to
     the training target (operators/sampling.rebalance_sample)
  6. Vocab health check       — top-K vocabulary + per-doc OOV rate
     (operators/lm.vocab_coverage)
  7. Sequence packing         — greedy first-fit into seq_len-token
     bins, per-bucket fill-rate report (operators/packing)

Run: python examples/prepare_training_set.py
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from cloud_crawler_spark.operators.dedup import exact_substr_dedup, latest_snapshot
from cloud_crawler_spark.operators.lm import bigram_lm_score, vocab_coverage
from cloud_crawler_spark.operators.packing import pack_sequences, packing_stats
from cloud_crawler_spark.functions.text import chunk_documents
from cloud_crawler_spark.operators.sampling import (
    dsir_weights,
    hash_split,
    rebalance_sample,
)

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

# 1. multi-dump collapse: synthesize a two-dump corpus (each doc also
#    present as an older snapshot with stale text), keep newest per url
dumps = docs.select(
    F.concat(F.lit("https://"), F.col("source"), F.lit("/"), F.col("doc_id"))
    .alias("url"),
    F.to_timestamp(F.lit("2024-06-01")).alias("warc_ts"),
    F.col("doc_id"), "text", "lang", "source",
).unionByName(
    docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/"), F.col("doc_id"))
        .alias("url"),
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.lit("STALE").alias("text"), "lang", "source",
    )
)
# stage boundaries get localCheckpoint(): each curation stage scans
# its input 1-5x, and lazily chaining them nests a copy of the whole
# upstream plan per scan — plan analysis goes exponential. At 100 TB
# these boundaries are intermediate tables; locally, checkpoints.
fresh = latest_snapshot(dumps).localCheckpoint()  # no STALE text survives
assert fresh.where(F.col("text") == "STALE").count() == 0

# 2. ExactSubstr passage dedup: cut every duplicated 8-token-window
#    passage (unaligned, cross-doc) — train on each passage once
deduped = (exact_substr_dedup(fresh, window=8)
           .where(F.col("clean_text") != "").localCheckpoint())
fresh = fresh.drop("text").join(
    deduped.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
).localCheckpoint()
print("passage-dedup dropped tokens:",
      deduped.agg(F.sum("n_dropped")).first()[0])

# 3. LM perplexity gate: keep docs below the 70th-permille ppl of the
#    corpus (a CCNet-style head+middle cut)
scored = fresh.join(bigram_lm_score(fresh.select("doc_id", "text")), "doc_id")
cut = scored.agg(F.expr("percentile_approx(ppl, 0.7)").alias("c"))
kept = (scored.crossJoin(F.broadcast(cut))
        .where(F.col("ppl") <= F.col("c")).drop("c").localCheckpoint())
print("after LM gate:", kept.count(), "/", fresh.count())

# 4. DSIR: weight docs against a target slice (here: the en docs as
#    the 'domain we want more of'), keep the top half by importance
w = dsir_weights(kept.select("doc_id", "text"),
                 kept.where(F.col("lang") == "en").select("doc_id", "text"))
med = w.agg(F.expr("percentile_approx(logw, 0.5)").alias("m"))
kept = (kept.join(w.select("doc_id", "logw"), "doc_id")
        .crossJoin(F.broadcast(med))
        .where(F.col("logw") >= F.col("m")).drop("m", "logw").localCheckpoint())
print("after DSIR gate:", kept.count())

# 5. rebalance to the training mixture (50/20/15/10/5)
target = {"en": 500, "de": 200, "fr": 150, "es": 100, "zh": 50}
mixed = rebalance_sample(kept, target)
mixed.groupBy("lang").count().orderBy("lang").show()

# 6. vocab health: OOV rate against the induced top-200 vocabulary
oov = vocab_coverage(mixed.select("doc_id", "text"))
oov.agg(F.round(F.avg("oov_rate"), 4).alias("mean_oov")).show()

# 7. leakage-safe split: key on the exact-dedup text hash so any
#    residual duplicates land on ONE side of the split
splits = hash_split(
    mixed.withColumn("dedup_key", F.md5("text")),
    {"train": 980, "val": 10, "test": 10}, key_col="dedup_key",
)
splits.groupBy("split").count().orderBy("split").show()
train = splits.where(F.col("split") == "train").drop("split", "dedup_key")

# 8. chunk overlong docs into 128-token windows (16-token overlap) so
#    no single doc spans training sequences un-shuffled
chunks = chunk_documents(train, chunk_tokens=128, overlap=16)
print("chunks:", chunks.count(), "docs in train:", train.count())
train = chunks.select(
    (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
    F.col("doc_id").alias("_orig"),
    F.col("chunk").alias("text"),
).join(
    train.select(F.col("doc_id").alias("_orig"), "lang"), "_orig"
).drop("_orig").localCheckpoint()

# 9. pack into 512-token training sequences, report fill rate
packed = pack_sequences(train, seq_len=512, n_buckets=8)
packing_stats(packed, seq_len=512).orderBy("bucket").show()
print("sequences:", packed.agg(F.countDistinct("bucket", "bin_id")).first()[0],
      "chunks packed:", packed.count())
