"""End-to-end training-data curation over a crawled corpus: the
operators a 100 TB LLM-data pipeline chains after the crawl, composed
in their production order. Every stage is a documented operator with
its own oracle-checked query; this example shows them composing.

Order matters and mirrors real pipelines (CCNet / RefinedWeb / Dolma):
  1. PII scrub      — redact before anything else persists text
  2. Blocklist      — drop blocked-domain documents outright
  3. Quality gates  — lang-ID + Gopher repetition signals
  4. Exact dedup    — cheap hash collapse first
  5. Span dedup     — strip boilerplate spans shared across docs
  6. Decontaminate  — remove eval-set n-gram overlap
  7. Mixture sample — deterministic per-language rates
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from cloud_crawler_spark.functions.text import lang_id, repetition_metrics, scrub_pii
from cloud_crawler_spark.operators.blocklist import apply_blocklist
from cloud_crawler_spark.operators.dedup import decontaminate, exact_dedup, span_dedup
from cloud_crawler_spark.operators.sampling import stratified_sample

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
# a held-out "benchmark" slice standing in for eval data
bench = docs.where(F.col("doc_id") % 37 == 0)
docs = docs.where(F.col("doc_id") % 37 != 0)

# 1. PII scrub (codegen regexp chain, zero shuffle)
docs = docs.withColumn("text", scrub_pii(F.col("text")))

# 2. domain blocklist (hosts here synthesized from the source column)
hosts = docs.withColumn("host", F.concat(F.lit("h"), F.col("doc_id") % 7,
                                         F.lit("."), F.col("source"), F.lit(".com")))
bl = spark.createDataFrame([("spamsite.com",)], "domain string")
docs = apply_blocklist(hosts, bl).where(F.col("blocked") == 0).drop("blocked", "host")

# 3. quality gates: language + Gopher repetition
docs = docs.withColumn("lang_pred", lang_id(F.col("text")))
rep = repetition_metrics(docs).where(F.col("keep_repetition") == 1).select("doc_id")
docs = docs.join(rep, "doc_id", "left_semi").where(F.col("lang_pred").isin("en", "de"))

# 4. exact dedup (min-id survivor per identical text)
docs = docs.join(exact_dedup(docs).select("doc_id"), "doc_id", "left_semi")

# 5. span-level dedup (cross-document boilerplate strip)
clean = span_dedup(docs, window=10).where(F.col("clean_text") != "")
docs = docs.drop("text").join(
    clean.select("doc_id", F.col("clean_text").alias("text")), "doc_id")

# 6. benchmark decontamination
docs = decontaminate(docs, bench, n=4).where(F.col("contaminated") == 0)

# 7. mixture sampling: keep 50% of en, 80% of the rest
out = stratified_sample(docs, rates_permille={"en": 500}, default_permille=800)

print("surviving docs:", out.count())
out.select("doc_id", "lang", F.substring("text", 1, 60).alias("text_head")) \
   .orderBy("doc_id").show(10, truncate=False)
spark.stop()
