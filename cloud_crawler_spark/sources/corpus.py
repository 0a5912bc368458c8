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


def transcode_pages(pages: "DataFrame", body_col: str = "html",
                    content_type_col: str | None = None) -> "DataFrame":
    """Charset-aware transcode of legacy-encoded pages to UTF-8 —
    the opt-in step BEFORE the byte-pinned parse path (whose
    UTF-8//IGNORE contract, page.rb:58,109-113, is reference parity
    and must not see charset logic). Real-web corpora are ~5-10%
    non-UTF-8 (GBK, Shift_JIS, windows-1251/2, latin-1); without this
    their text survives only as mojibake-stripped fragments.

    Detection order (WHATWG-encoding, simplified): BOM (UTF-8/16LE/
    16BE) -> charset= in the Content-Type column (when given) ->
    <meta charset> / http-equiv content-type in the first 1024 bytes
    (ASCII-compatible scan) -> UTF-8 fallback. Unknown/broken codecs
    fall back to UTF-8//IGNORE, so the pass never fails a page.

    Adds/overwrites ``body_col`` with UTF-8 bytes and adds a
    ``charset`` column with the decision. One Arrow-batched
    mapInPandas pass, no shuffle.
    """
    import re as _re

    import pandas as _pd

    other = [c for c in pages.columns if c != body_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pages.schema.fields if f.name != body_col
    )
    schema = f"{schema}, {body_col} binary, charset string"
    meta_re = _re.compile(
        rb'<meta[^>]+charset\s*=\s*["\']?\s*([A-Za-z0-9_\-]+)', _re.I)

    def detect(raw: bytes, ct: str | None) -> str:
        if raw[:3] == b"\xef\xbb\xbf":
            return "utf-8-sig"
        if raw[:2] == b"\xff\xfe":
            return "utf-16-le"
        if raw[:2] == b"\xfe\xff":
            return "utf-16-be"
        if ct and "charset=" in ct.lower():
            return ct.lower().split("charset=")[-1].split(";")[0].strip()
        m = meta_re.search(raw[:1024])
        if m:
            return m.group(1).decode("ascii", "ignore").lower()
        return "utf-8"

    def work(batches):
        for pdf in batches:
            charsets, bodies = [], []
            cts = pdf[content_type_col] if content_type_col else [None] * len(pdf)
            for raw, ct in zip(pdf[body_col], cts):
                if isinstance(raw, str):  # already-decoded corpus page
                    raw = raw.encode("utf-8")
                raw = bytes(raw or b"")
                cs = detect(raw, ct)
                try:
                    text = raw.decode(cs, errors="ignore")
                    used = cs
                except (LookupError, ValueError):
                    text = raw.decode("utf-8", errors="ignore")
                    used = "utf-8"
                charsets.append(used)
                bodies.append(text.encode("utf-8"))
            out = pdf[other].copy()
            out[body_col] = bodies
            out["charset"] = charsets
            yield _pd.DataFrame(out)

    return pages.mapInPandas(work, schema)
