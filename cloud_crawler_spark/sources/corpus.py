"""The web corpus: Common-Crawl-style `pages` table + redirects + robots.

Input shape is fixed by the BASELINE.json input_hint:
    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
plus two small side tables mirroring the reference's FakeWeb test
harness (spec/fakeweb_helper.rb:27-93):
    redirects(url STRING, redirect_to STRING, code INT)
    robots(host STRING, body STRING)

"Fetching" a URL is an equi-join of the frontier against `pages` on
`canon_url` (SURVEY.md §2.7) — the corpus-backed replacement for live
HTTP mandated by the north rule. The corpus is canonicalized ONCE at
load (`prepare_corpus`) so every round's fetch join is a plain
hash/sort-merge join on a precomputed key; at cluster scale this table
would be bucketed by `canon_url` so the join is co-located.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloud_crawler_spark.functions.canon import with_canon

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

REDIRECTS_SCHEMA = "url string, redirect_to string, code int"
ROBOTS_SCHEMA = "host string, body string"
SEEDS_SCHEMA = "url string, priority double"


@dataclass
class Corpus:
    """Prepared corpus: pages keyed by canon_url, redirect map, robots."""

    pages: DataFrame          # canon_url, host, url, warc_ts, html, text, lang, content_type
    redirects: DataFrame      # canon_url, redirect_to, code
    robots: DataFrame | None  # host, body
    page_keys: DataFrame | None = None  # canon_url only (see prepare_corpus)
    _has_redirects: bool | None = None

    def has_redirects(self) -> bool:
        if self._has_redirects is None:
            self._has_redirects = not self.redirects.isEmpty()
        return self._has_redirects

    def keys(self) -> DataFrame:
        """The corpus's canon_url column alone — the fetch join's miss
        detection (404s) only needs key membership, and probing the full
        pages cache for it re-reads every round what a one-column
        projection answers. On disk-native Iceberg/parquet this is the
        same column-pruned scan; locally it is its own slim cache."""
        if self.page_keys is not None:
            return self.page_keys
        return self.pages.select("canon_url")


def prepare_corpus(
    pages: DataFrame,
    redirects: DataFrame | None = None,
    robots: DataFrame | None = None,
) -> Corpus:
    spark = pages.sparkSession
    # optional content_type column (F8 gates, page.rb:185-195): an
    # HTML-only corpus omits it and every row is text/html
    if "content_type" not in pages.columns:
        pages = pages.withColumn("content_type", F.lit("text/html"))
    # the cached pages table is re-scanned by every round's fetch join;
    # columnar-cache compression makes that scan ~13x slower on multi-KB
    # html blobs (measured 10.6s -> 0.79s for a plain octet-length sum
    # over the cached column) for ~2x memory saved. The cache is a hot
    # working set, not cold storage — keep it uncompressed. Scoped:
    # set around cache registration + materialization only, then
    # restored, so unrelated caches the caller builds later in the same
    # session keep their configured compression.
    ckey = "spark.sql.inMemoryColumnarStorage.compressed"
    try:
        old = spark.conf.get(ckey)
    except Exception:  # noqa: BLE001 — unset: Spark default is "true"
        old = "true"
    spark.conf.set(ckey, "false")
    try:
        p = (
            with_canon(pages, "url")
            .select(
                "canon_url", "host", "url", "warc_ts", "html", "text", "lang",
                "content_type",
            )
            .dropDuplicates(["canon_url"])  # one fetchable body per canonical URL
            .cache()  # probed by every round's fetch join — keep canon'd form hot
        )
        if redirects is None:
            redirects = spark.createDataFrame([], REDIRECTS_SCHEMA)
        r = with_canon(redirects, "url").select("canon_url", "redirect_to", "code").cache()
        # slim key cache for per-round miss detection (Corpus.keys): one
        # string column in a handful of partitions instead of re-scanning
        # the html-width cache — measured ~3s/round at local[8] and ~10s at
        # local[2] on a 100k-page corpus, a pure fixed cost at every scale
        kparts = max(p.rdd.getNumPartitions() // 8, 4)
        page_keys = p.select("canon_url").coalesce(kparts).cache()
        # materialize inside the scope — the compression flag is read
        # when the cached blocks are BUILT, not when .cache() registers
        p.count()
        page_keys.count()
        r.count()
    finally:
        spark.conf.set(ckey, old)
    return Corpus(pages=p, redirects=r, robots=robots, page_keys=page_keys)


def load_corpus(spark: SparkSession, directory: str) -> Corpus:
    """Load a corpus directory of parquet files (pages.parquet required,
    redirects.parquet / robots.parquet optional)."""
    import os

    pages = spark.read.parquet(f"{directory}/pages.parquet")
    redirects = (
        spark.read.parquet(f"{directory}/redirects.parquet")
        if os.path.exists(f"{directory}/redirects.parquet")
        else None
    )
    robots = (
        spark.read.parquet(f"{directory}/robots.parquet")
        if os.path.exists(f"{directory}/robots.parquet")
        else None
    )
    return prepare_corpus(pages, redirects, robots)
