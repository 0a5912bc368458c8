"""Freshness-driven revisit pipeline (beyond the reference, which
re-crawls EVERYTHING on a timer — driver.rb:214-226 queue.recur).

Stage order of a production recrawl loop:
  1. initial crawl -> seen set (+ optional partitioned cuckoo filters)
  2. accumulate per-URL fetch history (fetch_ts, content hash)
  3. score change-rate x staleness priorities (operators/revisit.py,
     Cho & Garcia-Molina) and take the stalest K within budget
  4. expire those URLs from the seen set — exact table anti-join +
     IN-PLACE cuckoo_delete on the filters (the deletion capability
     Bloom lacks)
  5. re-crawl only them (revisit_crawl); links to pages added since
     last visit expand, everything still seen stays excluded.
With a live HttpFetcher, step 5 sends If-None-Match/If-Modified-Since
from the stored headers (operators/revisit.page_validators) so
unchanged pages answer 304 with no body transfer.
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from cloud_crawler_spark import CrawlConfig, crawl, revisit_crawl
from cloud_crawler_spark.operators.revisit import due_for_revisit, revisit_priority
from cloud_crawler_spark.operators.seen import build_cuckoo_filters
from cloud_crawler_spark.sources.corpus import prepare_corpus
from cloud_crawler_spark.sources.webgen import synth_pages, synth_seeds

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

pages = synth_pages(spark, 2000, n_hosts=20, links_per_page=8)
corpus = prepare_corpus(pages)
seeds = synth_seeds(spark, 50, 2000, n_hosts=20)

# 1. initial crawl; maintain the cuckoo seen filters
res = crawl(spark, corpus, seeds, CrawlConfig(depth_limit=2, batch_size=10_000))
seen = res.seen.localCheckpoint(eager=True)
filters = build_cuckoo_filters(seen).cache()

# 2. synthetic fetch history: two observations per crawled URL, where
# every 3rd URL changed between them (hash of html stands in for a
# content fingerprint; in production append one row per recrawl)
crawled = res.crawled.where("fetched AND code = 200")
h1 = crawled.select(
    "canon_url",
    F.lit("2013-04-01 00:00:00").cast("timestamp").alias("fetch_ts"),
    F.md5(F.col("html").cast("string")).alias("content_hash"),
)
h2 = crawled.select(
    "canon_url",
    F.lit("2013-04-03 00:00:00").cast("timestamp").alias("fetch_ts"),
    F.when(
        F.crc32(F.col("canon_url")) % 3 == 0, F.lit("changed!")
    ).otherwise(F.md5(F.col("html").cast("string"))).alias("content_hash"),
)
history = h1.unionByName(h2)

# 3. stalest 100 URLs by change-rate x staleness
pri = revisit_priority(history, "2013-04-08 00:00:00")
stale = due_for_revisit(pri, 100)
stale.select("canon_url", "n_changes", "change_rate", "priority").show(
    10, truncate=False
)

# 4+5. expire + partial recrawl (cuckoo filters kept in sync in place)
res2, filters2 = revisit_crawl(spark, corpus, seen, stale, filters=filters)
print(
    "revisited:",
    res2.crawled.where("fetched AND code = 200").count(),
    "of seen:",
    seen.count(),
)
spark.stop()
