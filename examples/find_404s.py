"""examples/find_404s.rb re-expressed: report broken links + referers.

The reference stores "404url:<url>" / "404ref:<referer>:<url>" keys in
an S3-backed cache inside on_every_page (find_404s.rb:44-52). Here the
crawled table already carries (code, url, referer) per fetch — the SEO
report is a filter+projection (A4, queries.q_error_report is the
oracle-checked twin).
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.sources.corpus import prepare_corpus
from cloud_crawler_spark.sources.webgen import fixture_corpus_rows
from cloud_crawler_spark.sources.corpus import PAGES_SCHEMA

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# a little site where two pages link to a missing one
graph = {
    "0": {"links": ["1", "missing"]},
    "1": {"links": ["missing", "2"]},
    "2": {},
    # note: no "missing" page in the corpus -> fetching it 404s
}
pages, _, _ = fixture_corpus_rows(graph)
corpus = prepare_corpus(spark.createDataFrame(pages, PAGES_SCHEMA))
seeds = spark.createDataFrame(
    [("http://www.example.com/0", 0.0)], "url string, priority double"
)

res = crawl(spark, corpus, seeds, CrawlConfig(depth_limit=2, discard_page=True))

report = res.crawled.where("code = 404").select("url", "referer", "code")
report.show(truncate=False)
spark.stop()
