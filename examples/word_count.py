"""examples/word_count.rb re-expressed: count words in page titles.

The reference schedules a batch crawl and increments a Redis counter
per title token inside on_every_page (word_count.rb:62-75). On Spark
the counter IS the aggregation: crawl, then one explode+groupBy over
the stored titles — distributed, no shared mutable cache needed.
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from cloud_crawler_spark import CrawlConfig, crawl
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

# page.document.title.downcase.split(/\s/) ... m_cache.incr(tok)
counts = (
    res.crawled.where("title IS NOT NULL")
    .select(F.explode(F.split(F.lower("title"), r"\s+")).alias("tok"))
    .where(F.col("tok") != "")
    .groupBy("tok")
    .count()
    .orderBy(F.desc("count"), "tok")
)
counts.show(20, truncate=False)
spark.stop()
