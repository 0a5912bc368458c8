"""End-to-end training-data curation walkthrough (VERDICT r4 task 8):
ONE pytest chaining the production pipeline over a crawled corpus —

  crawl -> charset transcode -> main-content extraction -> chrome
  strip -> clean (lang/quality/exact/near dedup) -> INCREMENTAL
  near-dup (day-2 delta vs day-1 index) -> decontaminate -> mixture
  rebalance -> sequence packing

— with the lineage counts asserted at every boundary. This is the
"does it all compose" proof a real user runs first: each stage's
output schema feeds the next stage's input contract, on the same
corpus, in one session. Individual operators are oracle-checked in
queries.py; THIS test checks the seams.

The fixture web is 24 pages in a binary-tree link graph (depth-5 BFS
closure covers all of them), each page carrying a link-dense nav bar
(main-content strips it), a shared copyright footer (chrome strip
removes it), and a unique main paragraph — with pages 20/21 planted
as exact/near duplicates of pages 4/5, and half the corpus encoded
latin-1 with accented words (the transcode stage's work).
"""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark import CrawlConfig, crawl
from cloud_crawler_spark.functions.boilerplate import with_main_text
from cloud_crawler_spark.functions.lines import strip_common_lines
from cloud_crawler_spark.operators.dedup import (
    clean_corpus,
    decontaminate,
    lsh_incremental_pairs,
)
from cloud_crawler_spark.operators.packing import pack_sequences
from cloud_crawler_spark.operators.sampling import rebalance_sample
from cloud_crawler_spark.sources.corpus import prepare_corpus, transcode_pages
from cloud_crawler_spark.sources.store import FrontierStore

N_PAGES = 24

_NAV = (
    '<div class="nav"><a href="/p{a}">next page link</a> '
    '<a href="/p{b}">more pages link</a></div>'
)
_FOOTER = "<p>Copyright Example Site all rights reserved worldwide</p>"


def _main_sentence(i: int) -> str:
    # planted duplicates: p20 == p4 exactly, p21 ~= p5 (near dup)
    if i == 20:
        return _main_sentence(4)
    if i == 21:
        return _main_sentence(5) + " extra trailing tokens here"
    accent = " the café résumé review" if i % 2 else ""
    words = " ".join(f"unique{i}word{j} common{j % 3}" for j in range(14))
    return (
        f"Main article {i} body{accent}: {words} closing sentence for "
        f"document number {i}."
    )


def _page_html(i: int) -> bytes:
    cs = "iso-8859-1" if i % 2 else "utf-8"
    html = (
        f'<html><head><meta charset="{cs}"><title>Page {i}</title></head>'
        f"<body>{_NAV.format(a=2 * i + 1, b=2 * i + 2)}"
        f'<div class="main"><p>{_main_sentence(i)}</p></div>'
        f"{_FOOTER}</body></html>"
    )
    return html.encode("latin-1" if cs == "iso-8859-1" else "utf-8")


@pytest.fixture(scope="module")
def pipeline_store(spark, tmp_path_factory):
    """Stage 1 — CRAWL the fixture web into a snapshot store."""
    pages = spark.createDataFrame(
        [
            (
                f"http://ex.com/p{i}",
                "2013-04-01 00:00:00",
                _page_html(i),
                "",
                "en",
            )
            for i in range(N_PAGES)
        ],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    store = FrontierStore(
        spark, str(tmp_path_factory.mktemp("pipeline") / "store")
    )
    seeds = spark.createDataFrame(
        [("http://ex.com/p0", 0.0)], "url string, priority double"
    )
    res = crawl(
        spark, prepare_corpus(pages), seeds,
        CrawlConfig(depth_limit=5), store=store,
    )
    return store, res


def test_full_training_pipeline(spark, pipeline_store):
    store, res = pipeline_store

    # ---- stage 1 lineage: the binary-tree closure covers ALL pages,
    # and the store's per-partition counters agree with the result
    fetched = res.crawled.where("fetched AND code = 200")
    assert fetched.count() == N_PAGES
    lin_fetched = store.lineage().agg(F.sum("fetched")).first()[0]
    assert lin_fetched == N_PAGES

    # ---- stage 2: charset transcode of the STORED raw bytes (the
    # store also records 404 discoveries — the curation input is the
    # fetched pages only)
    raw = store.crawled().where("fetched AND code = 200").select(
        F.col("canon_url"), F.col("html"),
        F.regexp_extract("canon_url", r"p(\d+)$", 1).cast("long").alias("doc_id"),
    )
    coded = transcode_pages(raw, body_col="html")
    by_cs = {r["charset"]: r["n"] for r in coded.groupBy("charset")
             .agg(F.count("*").alias("n")).collect()}
    assert by_cs == {"utf-8": N_PAGES // 2, "iso-8859-1": N_PAGES // 2}
    # the latin-1 bytes now decode as UTF-8 with accents intact
    odd = coded.where(F.col("doc_id") % 2 == 1).select(
        F.decode("html", "UTF-8").alias("h")
    )
    assert odd.where(~F.col("h").contains("café")).count() == 0

    # ---- stage 3: main-content extraction drops the link-dense nav
    mained = with_main_text(
        coded.withColumn("html", F.decode("html", "UTF-8"))
    )
    assert mained.where(F.col("main_text").contains("next page link")).count() == 0
    # ...while every page's main paragraph (incl. the planted dups,
    # which copy p4/p5's) survives
    assert mained.where(
        ~F.col("main_text").contains("closing sentence")
    ).count() == 0
    # ...but the copyright footer (plain text) survives main-content —
    # that's the CHROME STRIP stage's job:

    # ---- stage 4: cross-corpus chrome strip (footer in all 24 docs)
    stripped = strip_common_lines(
        mained.select("doc_id", F.col("main_text").alias("text")),
        min_docs=20,
    )
    assert stripped.where(F.col("text_clean").contains("Copyright")).count() == 0
    assert stripped.where(~F.col("text_clean").contains("Main article")).count() == 0
    docs = stripped.select(
        "doc_id", F.col("text_clean").alias("text")
    ).localCheckpoint()

    # ---- stage 5: clean (lang gate + quality + exact dedup + simhash)
    cleaned = clean_corpus(docs, min_tokens=10)
    survivors = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert 20 not in survivors  # exact dup of p4 collapses to min id
    assert 4 in survivors
    assert len(survivors) <= N_PAGES - 1

    # ---- stage 6: INCREMENTAL near-dup — day-1 index, day-2 delta
    base = docs.where(F.col("doc_id") < 16)     # day-1 corpus
    delta = docs.where(F.col("doc_id") >= 16)   # day-2 ingest
    pairs = lsh_incremental_pairs(base, delta, k=16, bands=8)
    hit = {(r["base_id"], r["delta_id"]) for r in pairs.collect()}
    assert (4, 20) in hit   # exact dup found across days
    assert (5, 21) in hit   # near dup found across days
    # history never re-pairs against itself
    assert all(b < 16 <= d for b, d in hit)

    # ---- stage 7: decontaminate against an eval benchmark that
    # quotes p7's main sentence
    bench = spark.createDataFrame(
        [(0, _main_sentence(7))], "bid long, text string"
    )
    decon = decontaminate(docs, bench, n=8)
    flagged = {r["doc_id"] for r in
               decon.where(F.col("contaminated") == 1).collect()}
    assert flagged == {7}
    train_docs = decon.where(F.col("contaminated") == 0).drop("contaminated")

    # ---- stage 8: mixture rebalance over a synthetic lang column
    langs = train_docs.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "de").otherwise("en")
    )
    mixed = rebalance_sample(langs, {"en": 1000, "de": 500})
    n_de = mixed.where(F.col("lang") == "de").count()
    n_de_in = langs.where(F.col("lang") == "de").count()
    assert 0 < n_de <= n_de_in  # de downsampled, en kept
    assert mixed.where(F.col("lang") == "en").count() == \
        langs.where(F.col("lang") == "en").count()

    # ---- stage 9: sequence packing — every doc gets a slot, no bin
    # overflows seq_len (long docs truncate, flagged)
    packed = pack_sequences(mixed, seq_len=64, n_buckets=4)
    assert packed.count() == mixed.count()
    over = (
        packed.groupBy("bucket", "bin_id")
        .agg(F.sum(F.least(F.col("n_tokens"), F.lit(64))).alias("filled"))
        .where(F.col("filled") > 64)
    )
    assert over.count() == 0


def test_pipeline_resume_seam(spark, pipeline_store):
    """The curation stages read the SNAPSHOT store, so a resumed crawl
    feeds the identical curation input: re-open the store fresh and
    check the stage-2 input is byte-identical."""
    store, _ = pipeline_store
    reopened = FrontierStore(spark, store.base)
    q = 'fetched AND code = 200'
    a = sorted(
        (r["canon_url"], bytes(r["html"]))
        for r in store.crawled().where(q).select("canon_url", "html").collect()
    )
    b = sorted(
        (r["canon_url"], bytes(r["html"]))
        for r in reopened.crawled().where(q).select("canon_url", "html").collect()
    )
    assert a == b and len(a) == N_PAGES
