"""Deterministic synthetic web generator (seed-derived, no wall clock).

Produces `pages` tables of exactly the mandated input shape
(url, warc_ts, html, binary, text, lang) at any scale, entirely from
hash arithmetic — generated DISTRIBUTEDLY via spark.range, so a
100M-page corpus never touches the driver. Used by tests (FakePage-
style fixture graphs, spec/fakeweb_helper.rb:27-93), by `entry()`, and
by the bench harness (sf-scaled corpora for the N-vs-4N scaling runs).

Link structure: page i on host h links to k pseudo-random pages, biased
to the same host, where k and the targets derive from xxhash64-style
mixing of (seed, i) — no Python RNG state, so any row can be generated
independently on any executor.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH = "2013-04-01 00:00:00"  # fixed epoch; warc_ts = epoch + row index sec


def _layout(n_pages: int, n_hosts: int, hot_host_frac: float):
    """Closed-form host layout so any executor can both (a) compute the
    host of page i and (b) enumerate the pages of a host — which makes
    every generated same-host link RESOLVE to a real page.

    Pages [0, hot) live on host 0 (the hot host, `hot_host_frac` of the
    corpus); page i >= hot lives on host 1 + (i - hot) % (n_hosts - 1).
    """
    hot = int(n_pages * hot_host_frac)
    cold_hosts = max(n_hosts - 1, 1)
    return hot, cold_hosts


def _host_expr(page_id, n_pages: int, n_hosts: int, hot_host_frac: float):
    hot, cold_hosts = _layout(n_pages, n_hosts, hot_host_frac)
    return F.when(page_id < hot, F.lit(0)).otherwise(
        1 + F.pmod(page_id - hot, F.lit(cold_hosts))
    )


def _same_host_target(page_id, hostid, rnd, n_pages: int, n_hosts: int, hot_host_frac: float):
    """A pseudo-random page id guaranteed to live on `hostid`."""
    hot, cold_hosts = _layout(n_pages, n_hosts, hot_host_frac)
    per_cold = max((n_pages - hot) // cold_hosts, 1)
    on_hot = F.pmod(rnd, F.lit(max(hot, 1)))
    on_cold = hot + (hostid - 1) + F.pmod(rnd, F.lit(per_cold)) * cold_hosts
    return F.when(F.lit(hot) > 0, F.when(hostid == 0, on_hot).otherwise(on_cold)).otherwise(on_cold)


def synth_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 100,
    links_per_page: int = 8,
    hot_host_frac: float = 0.0,
    seed: int = 42,
    partitions: int | None = None,
    body_words: int = 12,
) -> DataFrame:
    """Generate pages(url, warc_ts, html, text, lang) distributedly.

    html embeds `links_per_page` <a href> links to other synthetic
    pages (same-host bias 3:1); text is the deterministic extracted-
    text golden for that html (title + para words).
    """
    parts = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_pages, 1, parts).withColumnRenamed("id", "pid")
    ids = ids.withColumn(
        "hostid", _host_expr(F.col("pid"), n_pages, n_hosts, hot_host_frac)
    )
    url = F.concat(
        F.lit("http://host"), F.col("hostid").cast("string"),
        F.lit(".example.com/p"), F.col("pid").cast("string"),
    )

    # deterministic link targets: j-th link of page i; 3 of 4 links stay
    # on the SAME host (picked from that host's page set so they
    # resolve), 1 of 4 jumps to a uniform page on its actual host
    link_exprs = []
    for j in range(links_per_page):
        rnd = F.pmod(F.xxhash64(F.lit(seed), F.col("pid"), F.lit(j)), F.lit(n_pages))
        same_host = F.pmod(F.xxhash64(F.lit(seed + 1), F.col("pid"), F.lit(j)), F.lit(4)) < 3
        tgt_same = _same_host_target(
            F.col("pid"), F.col("hostid"), rnd, n_pages, n_hosts, hot_host_frac
        )
        tgt = F.when(same_host, tgt_same).otherwise(rnd)
        tgt_host = F.when(same_host, F.col("hostid")).otherwise(
            _host_expr(rnd, n_pages, n_hosts, hot_host_frac)
        )
        link_exprs.append(
            F.concat(
                F.lit("http://host"), tgt_host.cast("string"),
                F.lit(".example.com/p"), tgt.cast("string"),
            )
        )
    links_arr = F.array(*link_exprs)

    title = F.concat(
        F.lit("Page "), F.col("pid").cast("string"),
        F.lit(" on host "), F.col("hostid").cast("string"),
    )
    # body words: 12 deterministic tokens from a small vocabulary
    vocab = F.array(*[F.lit(w) for w in (
        "spark", "crawl", "frontier", "bloom", "politeness", "robots",
        "shuffle", "broadcast", "parquet", "iceberg", "arrow", "catalyst",
    )])
    # body: body_words deterministic tokens; beyond 24 expressions,
    # tile a 24-word seed paragraph (keeps the expr tree bounded while
    # letting pages weigh like real web pages, 10-100 KB)
    n_expr = min(body_words, 24)
    word_exprs = [
        F.element_at(vocab, (F.pmod(F.xxhash64(F.lit(seed + 2), F.col("pid"), F.lit(j)), F.lit(12)) + 1).cast("int"))
        for j in range(n_expr)
    ]
    para = F.concat_ws(" ", *word_exprs)
    if body_words > n_expr:
        reps = body_words // n_expr
        para = F.concat_ws(" ", *([para] * reps))

    anchors = F.concat_ws(
        "",
        F.transform(links_arr, lambda u: F.concat(F.lit('<a href="'), u, F.lit('">x</a>'))),
    )
    html_str = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title></head><body><p>"),
        para, F.lit("</p>"), anchors, F.lit("</body></html>"),
    )
    # golden text = Nokogiri-style concatenation of text nodes:
    # title + para + one "x" per link, then strip (our parse semantics)
    golden = F.concat(title, para, F.lit("x" * links_per_page))

    return ids.select(
        url.alias("url"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(_EPOCH).cast("timestamp")) + F.col("pid")
        ).alias("warc_ts"),
        F.encode(html_str, "utf-8").alias("html"),
        golden.alias("text"),
        F.lit("en").alias("lang"),
    )


def synth_seeds(spark: SparkSession, n_seeds: int, n_pages: int, n_hosts: int = 100,
                hot_host_frac: float = 0.0) -> DataFrame:
    """Seeds spread across the page space (stride keeps them off a
    single host block)."""
    stride = max(n_pages // max(n_seeds, 1), 1)
    ids = spark.range(0, n_seeds).select((F.col("id") * stride).alias("pid"))
    ids = ids.withColumn(
        "hostid", _host_expr(F.col("pid"), n_pages, n_hosts, hot_host_frac)
    )
    return ids.select(
        F.concat(
            F.lit("http://host"), F.col("hostid").cast("string"),
            F.lit(".example.com/p"), F.col("pid").cast("string"),
        ).alias("url"),
        F.lit(0.0).alias("priority"),
    )


# ---------------------------------------------------------- FakePage-style
# Tiny hand-built fixture graphs for the pytest re-expressions of the
# reference specs. Row-level construction is fine here (4-200 rows).


def fake_page_html(
    name: str,
    links: list[str] | None = None,
    hrefs: list[str] | None = None,
    base: str | None = None,
    body_extra: str = "",
    host: str = "www.example.com",
) -> str:
    """Build a FakePage-equivalent HTML body
    (spec/fakeweb_helper.rb:27-66): named same-host links + raw hrefs."""
    all_hrefs = [f"http://{host}/{l}" for l in (links or [])] + list(hrefs or [])
    anchors = "".join(f'<a href="{h}">link {i}</a> ' for i, h in enumerate(all_hrefs))
    base_tag = f'<base href="{base}" />' if base else ""
    return (
        f"<html><head>{base_tag}<title>page {name}</title></head>"
        f"<body>{anchors}{body_extra}</body></html>"
    )


def fixture_corpus_rows(graph: dict) -> tuple[list, list, list]:
    """graph: {name: {links:[names], hrefs:[urls], base:str, body:str}}.

    Returns (pages_rows, redirects_rows, robots_rows) ready for
    spark.createDataFrame against the corpus schemas.
    """
    ts0 = _dt.datetime(2013, 4, 1)
    pages, redirects, robots = [], [], []
    for i, (name, spec) in enumerate(graph.items()):
        host = spec.get("host", "www.example.com")
        url = spec.get("url", f"http://{host}/{name}")
        if "redirect_to" in spec:
            redirects.append((url, spec["redirect_to"], 301))
            html = spec.get("body", "") or ""
        else:
            html = spec.get("body") or fake_page_html(
                name,
                links=spec.get("links"),
                hrefs=spec.get("hrefs"),
                base=spec.get("base"),
                host=host,
            )
        if "robots_body" in spec:
            robots.append((host, spec["robots_body"]))
            continue
        from cloud_crawler_spark.functions.parse import extract_text_py

        pages.append(
            (url, ts0 + _dt.timedelta(seconds=i), html.encode(), extract_text_py(html), "en")
        )
    return pages, redirects, robots
