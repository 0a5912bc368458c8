"""End-to-end training-data curation over a crawled corpus: the
operators a 100 TB LLM-data pipeline chains after the crawl, composed
in their production order. Every stage is a documented operator with
its own oracle-checked query; this example shows them composing.

Order matters and mirrors real pipelines (CCNet / RefinedWeb / Dolma):
  1. PII scrub       — redact before anything else persists text
  2. Blocklist       — drop blocked-domain documents outright
  3. Chrome strip    — remove lines shared across >= N documents
                       (RefinedWeb line-dedup) BEFORE quality stats,
                       so banners don't distort them
  4. Quality gates   — lang-ID, Gopher repetition (2-gram + line/
                       paragraph), full Gopher §A1.2 rule set,
                       script-mix + char-entropy spam gates
  5. Exact dedup     — cheap hash collapse first
  6. Span dedup      — strip boilerplate spans shared across docs
  7. Decontaminate   — remove eval-set n-gram overlap
  8. Mixture sample  — deterministic per-language rates
  9. Vectorize       — feature-hashed doc vectors for the ANN stack
                       (near-dup audit / SemDeDup downstream)
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from cloud_crawler_spark.functions.lines import strip_common_lines
from cloud_crawler_spark.functions.text import (
    char_entropy,
    gopher_quality,
    host_concentration,
    lang_id,
    lang_id_trigram,
    lr_quality_score,
    repetition_metrics,
    script_profile,
    scrub_pii,
    unit_repetition_metrics,
    zipf_fit,
)
from cloud_crawler_spark.operators.blocklist import apply_blocklist
from cloud_crawler_spark.operators.dedup import decontaminate, exact_dedup, span_dedup
from cloud_crawler_spark.operators.sampling import stratified_sample
from cloud_crawler_spark.operators.similarity import hashed_vectors

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.driver.memory", "4g")
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

# 3. cross-corpus chrome strip (synthetic banner shared by every doc;
#    min_docs low because the sample corpus is small)
lined = docs.withColumn(
    "text", F.concat(F.lit("Subscribe to our newsletter.\n"), F.col("text")))
stripped = strip_common_lines(lined, min_docs=30)
docs = docs.drop("text").join(
    stripped.where(F.col("text_clean") != "")
    .select("doc_id", F.col("text_clean").alias("text")),
    "doc_id",
)

# 4. quality gates: language, Gopher repetition (2-gram + line level),
#    full Gopher rule set, script-mix + entropy spam gates
docs = docs.withColumn("lang_pred", lang_id(F.col("text")))
rep = repetition_metrics(docs).where(F.col("keep_repetition") == 1).select("doc_id")
linerep = unit_repetition_metrics(docs, "line") \
    .where(F.col("keep_lines") == 1).select("doc_id")
# the sample corpus is ~30-80-word synthetic keyword streams: relax
# the word-count floor and the 8-stopword gate (prose-calibrated) so
# the structural gates (symbols, bullets, word shape) decide
gq = gopher_quality(docs, min_words=10, min_stopwords=1) \
    .where(F.col("keep_quality") == 1).select("doc_id")
spam = script_profile(docs).where(F.col("mixed_script") == 0).select("doc_id")
ent = char_entropy(docs).where(F.col("entropy_nats") >= 1.0).select("doc_id")
for gate in (rep, linerep, gq, spam, ent):
    docs = docs.join(gate, "doc_id", "left_semi")
docs = docs.where(F.col("lang_pred").isin("en", "de"))

# 4b. model-based gate: LR classifier inference (threshold lowered —
#     the synthetic corpus carries no punctuation, so the punct term
#     contributes 0 and scores top out near 0.49)
lr = lr_quality_score(docs, threshold=0.2) \
    .where(F.col("keep_lr") == 1).select("doc_id")
docs = docs.join(lr, "doc_id", "left_semi")

# 4c. language consensus: the trigram profile must agree with the
#     stopword vote (or abstain) — two independent heuristics
docs = docs.withColumn("lang_tri", lang_id_trigram(F.col("text"))).where(
    (F.col("lang_tri") == F.col("lang_pred")) | (F.col("lang_tri") == "und")
).drop("lang_tri")

# 5. exact dedup (min-id survivor per identical text)
docs = docs.join(exact_dedup(docs).select("doc_id"), "doc_id", "left_semi")

# 6. span-level dedup (cross-document boilerplate strip)
clean = span_dedup(docs, window=10).where(F.col("clean_text") != "")
docs = docs.drop("text").join(
    clean.select("doc_id", F.col("clean_text").alias("text")), "doc_id")

# 7. benchmark decontamination
docs = decontaminate(docs, bench, n=4).where(F.col("contaminated") == 0)

# 8. mixture sampling: keep 50% of en, 80% of the rest
out = stratified_sample(docs, rates_permille={"en": 500}, default_permille=800)
# truncate the 8-stage lineage before the fan-out stages below: zipf /
# diversity / PQ each re-derive `out` several times, and the nested
# plan alone (not the data) is what overflows the driver otherwise
out = out.localCheckpoint(eager=True)

# 9. feature-hashed vectors: the text->vector bridge for the ANN stack
vecs = hashed_vectors(out, dim=32, l2_normalize=True)

# 10. PQ-compress the vectors for the ANN store: m=4 codes/vector
#     (the 100 TB memory story — codes + codebooks replace the floats)
from cloud_crawler_spark.operators.similarity import (  # noqa: E402
    pq_encode,
    train_pq_codebooks,
)

emb = vecs.select(F.col("doc_id").alias("vec_id"),
                  F.col("vec").alias("embedding"))
books = train_pq_codebooks(emb, n_subspaces=4, n_codes=16, n_iters=1)
codes = pq_encode(emb, books, method="arrow")

# 11. corpus health report (one-row diagnostics a pipeline logs per dump)
zipf = zipf_fit(out).collect()[0]
hosted = out.withColumn(
    "host", F.concat(F.lit("h"), F.col("doc_id") % 7))
div = host_concentration(hosted, weight_col="n_chars").collect()[0]

# 12. sketch audits (bounded-state, mergeable — the per-dump numbers
#     a 100 TB pipeline logs without a distinct shuffle): heavy-hitter
#     boilerplate phrases via count-min, distinct-URL-per-host via HLL
from cloud_crawler_spark.operators.sketches import cms_heavy_hitters, hll_distinct

toks = out.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")) \
          .where(F.col("tok") != "")
hh = cms_heavy_hitters(toks, "tok", threshold=max(out.count(), 10), w=2048)
print("heavy-hitter tokens (cms est >= n_docs):", hh.count())
urls = hosted.select("host",
                     F.concat(F.lit("https://"), F.col("host"),
                              F.lit("/"), F.col("doc_id")).alias("url"))
hll = hll_distinct(urls, "url", "host")
print("per-host distinct-URL estimates:",
      sorted((r.host, round(r.est)) for r in hll.collect())[:3], "...")

# 13. final subset election, two deterministic samplers:
#     quality-weighted (Efraimidis-Spirakis, weight = n_chars) and
#     embedding-diversity (cluster-then-cap with sqrt quotas)
from cloud_crawler_spark.operators.sampling import (
    cluster_balanced_sample, weighted_sample,
)

wsub = weighted_sample(out.select("doc_id", "n_chars"), "n_chars",
                       k=min(100, out.count()))
print("weighted subset:", wsub.count(), "docs")
dsub = cluster_balanced_sample(
    emb.withColumn("embedding",
                   F.transform("embedding", lambda x: x.cast("double"))),
    total_target=100, n_lists=8, n_iters=0,
    vec_col="embedding", id_col="vec_id")
print("diversity subset per cluster:",
      sorted(r["cnt"] for r in dsub.groupBy("list_id").agg(
          F.count("*").alias("cnt")).collect()))

print("surviving docs:", out.count())
print("vectorized:", vecs.where(F.col("n_tokens") > 0).count())
print("pq codes:", codes.count(), "(4 per vector)")
print(f"zipf slope {zipf['zipf_slope']} over {zipf['n_types']} types / "
      f"{zipf['n_tokens']} tokens")
print(f"host diversity: hhi {div['hhi']} entropy {div['host_entropy']} "
      f"top1 {div['top1_share']}")
out.select("doc_id", "lang", F.substring("text", 1, 60).alias("text_head")) \
   .orderBy("doc_id").show(10, truncate=False)
spark.stop()
