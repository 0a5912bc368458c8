"""examples/count_listings.rb re-expressed: count listing links.

The reference crawls eBay listing pages and, in focus_crawl, selects
links with page.select_links_by("//h4/a[@href]") and counts them
(count_listings.rb:30-34). Here the selector compiles to an exact
matcher and runs as an Arrow-batched UDF over the stored pages — the
count is one aggregate.
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from cloud_crawler_spark.functions.parse import make_scoped_links_udf

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# listing-shaped pages: <h4><a href=...> per listing, plus nav links
# that must NOT count
rows = []
for i in range(200):
    listings = "".join(
        f'<h4><a href="/item/{i}-{j}">listing</a></h4>' for j in range(i % 5)
    )
    html = (
        f"<html><body><nav><a href='/home'>home</a></nav>{listings}</body></html>"
    )
    rows.append((f"http://shop.example.com/page{i}", html.encode()))

pages = spark.createDataFrame(rows, "url string, html binary")

scoped = make_scoped_links_udf("//h4/a[@href]")
n = (
    pages.select(F.explode(scoped(F.col("html"))).alias("lnk"))
    .count()
)
print(f"listing links: {n}")  # 200 pages x (i%5) listings = 400
assert n == sum(i % 5 for i in range(200))
spark.stop()
