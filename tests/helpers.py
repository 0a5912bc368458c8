"""Shared fixture-building helpers for the crawl spec re-expressions."""

from __future__ import annotations

from pyspark.sql import SparkSession

from cloud_crawler_spark.sources.corpus import (
    Corpus,
    PAGES_SCHEMA,
    REDIRECTS_SCHEMA,
    ROBOTS_SCHEMA,
    SEEDS_SCHEMA,
    prepare_corpus,
)
from cloud_crawler_spark.sources.webgen import fixture_corpus_rows


def make_corpus(spark: SparkSession, graph: dict) -> Corpus:
    pages, redirects, robots = fixture_corpus_rows(graph)
    pages_df = spark.createDataFrame(pages, PAGES_SCHEMA)
    red_df = spark.createDataFrame(redirects, REDIRECTS_SCHEMA) if redirects else None
    rob_df = spark.createDataFrame(robots, ROBOTS_SCHEMA) if robots else None
    return prepare_corpus(pages_df, red_df, rob_df)


def make_seeds(spark: SparkSession, urls: list[str]):
    return spark.createDataFrame([(u, 0.0) for u in urls], SEEDS_SCHEMA)


def crawled_names(result, host: str = "www.example.com") -> set[str]:
    """Short names of successfully fetched pages on the fixture host."""
    rows = result.crawled.where("fetched AND code = 200").select("canon_url").collect()
    prefix = f"http://{host}/"
    return {r["canon_url"].replace(prefix, "") for r in rows}


def crawl_order(result) -> list[str]:
    rows = (
        result.crawled.where("code = 200 AND fetched")
        .select("rank", "hop", "canon_url")
        .collect()
    )
    return [r["canon_url"] for r in sorted(rows, key=lambda r: (r["rank"], r["hop"]))]
