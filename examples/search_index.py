"""Post-crawl retrieval pipeline (beyond the reference, whose analysis
surface stops at word_count.rb): crawl -> strip boilerplate ->
flat postings -> BM25 search.

Stage order of a production corpus-to-search pipeline:
  1. crawl the site (corpus mode here; swap in HttpFetcher for live)
  2. extract MAIN content (functions/boilerplate.py) — index the
     article, not the nav chrome
  3. build the flat (term, doc, tf) posting table (operators/index.py)
  4. rank with Okapi BM25; incremental maintenance after a revisit
     goes through merge_postings (see q_index_delta).
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.functions.boilerplate import with_main_text
from cloud_crawler_spark.operators.index import bm25, postings, tfidf_topk
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

res = crawl(spark, corpus, seeds, CrawlConfig(depth_limit=2, batch_size=10_000))
docs = (
    with_main_text(res.crawled.where("fetched AND code = 200"))
    .select(F.col("canon_url").alias("doc_id"), F.col("main_text").alias("text"))
)

post = postings(docs, id_col="doc_id")
print("postings:", post.count(), "terms:", post.select("term").distinct().count())

print("top distinctive terms of 3 documents:")
tfidf_topk(docs, 3, id_col="doc_id").orderBy("doc_id", F.desc("tfidf")).show(
    9, truncate=False
)

print('BM25 for query "spark shuffle politeness":')
hits = bm25(docs, "spark shuffle politeness", id_col="doc_id")
hits.orderBy(F.desc("score"), "doc_id").show(10, truncate=False)
spark.stop()
