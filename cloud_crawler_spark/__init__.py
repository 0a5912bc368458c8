"""cloud_crawler_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the crawl semantics of the reference Ruby crawler
(CalculatedContent/cloud-crawler) on idiomatic Spark DataFrames:

- URL frontier as a snapshotted table driven by iterative batch rounds
  (reference: qless/Redis BFS job queue, lib/cloud-crawler/driver.rb).
- URL-seen set as an exact anti-join table plus a partitioned Bloom
  filter for scale (reference: redis_url_bloomfilter.rb).
- Politeness / robots / depth gating as window ranks, broadcast joins
  and column predicates (reference: dsl_core.rb visit_link? chain).
- HTML link/text extraction as Arrow-batched pandas UDFs (reference:
  Nokogiri parse in page.rb).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from cloud_crawler_spark.config import CrawlConfig
from cloud_crawler_spark.plans.crawler import (
    Crawler,
    crawl,
    curl,
    recurring_crawl,
    revisit_crawl,
)

__all__ = ["CrawlConfig", "Crawler", "crawl", "curl", "recurring_crawl", "revisit_crawl"]
__version__ = "0.1.0"
