"""examples/link_selector.rb re-expressed: gate the crawl by selector.

The reference composes focus_crawl + select_links_by so only
selector-matched links are followed (link_selector.rb:50-54,
dsl_core.rb:195). Here that composition is one config knob:
CrawlConfig(link_selector=...).
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.sources.corpus import PAGES_SCHEMA, prepare_corpus
from cloud_crawler_spark.sources.webgen import fixture_corpus_rows

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# page 0 links to 1 inside a classed div and to 2 outside it
body0 = (
    "<html><body>"
    '<div class="listings"><a href="http://www.example.com/1">follow</a></div>'
    '<a href="http://www.example.com/2">ignore</a>'
    "</body></html>"
)
graph = {"0": {"body": body0}, "1": {}, "2": {}}
pages, _, _ = fixture_corpus_rows(graph)
corpus = prepare_corpus(spark.createDataFrame(pages, PAGES_SCHEMA))
seeds = spark.createDataFrame(
    [("http://www.example.com/0", 0.0)], "url string, priority double"
)

res = crawl(
    spark, corpus, seeds, CrawlConfig(link_selector="div.listings a")
)
crawled = sorted(r[0] for r in res.crawled.select("canon_url").collect())
print("crawled:", crawled)  # page 2 never enters the frontier
assert crawled == ["http://www.example.com/0", "http://www.example.com/1"]
spark.stop()
