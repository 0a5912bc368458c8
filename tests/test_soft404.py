"""Unit semantics for soft-404 detection (operators/soft404.py).
Value parity vs DuckDB is pinned by the q_soft404 oracle; these pin
the hand-checkable classifier edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_crawler_spark.operators.soft404 import (
    host_soft404_rates,
    soft404_flag,
    soft404_hosts,
)

LONG_TAIL = " filler" * 80  # pushes any body past the 50-word gate


def _pages(spark):
    rows = [
        # (host, code, text, expect_flag)
        ("a.com", 200, "Sorry, the page you requested could not be found.", True),
        ("a.com", 200, "404 error - nothing here", True),
        ("a.com", 200, "a perfectly fine short page about cats", False),
        # long article merely MENTIONING the phrase survives the word gate
        ("a.com", 200, "the page not found error explained" + LONG_TAIL, False),
        # hard 404: honest status, never a soft404
        ("a.com", 404, "page not found", False),
        ("b.com", 200, "normal content one", False),
        ("b.com", 200, "normal content two", False),
    ]
    return spark.createDataFrame(
        [(h, c, t) for h, c, t, _ in rows],
        "host string, code int, text string",
    ), rows


def test_soft404_flag_edges(spark):
    df, rows = _pages(spark)
    got = df.select(
        "host", "text",
        soft404_flag(F.col("text"), F.col("code")).alias("flag"),
    ).collect()
    expect = {(r[0], r[2]): r[3] for r in rows}
    for row in got:
        assert row.flag == expect[(row.host, row.text)], row.text


def test_host_rates_exclude_hard_404s(spark):
    df, _ = _pages(spark)
    rates = {
        r.host: r for r in host_soft404_rates(df).collect()
    }
    # a.com: 4 pages with code 200 (hard 404 excluded), 2 soft
    assert rates["a.com"].n_200 == 4
    assert rates["a.com"].n_soft404 == 2
    assert rates["a.com"].soft404_rate == 0.5
    assert rates["b.com"].n_soft404 == 0


def test_min_pages_guard(spark):
    df, _ = _pages(spark)
    # rate threshold met for a.com but min_pages=5 filters it out
    assert soft404_hosts(df, min_rate=0.5, min_pages=5).count() == 0
    hosts = [r.host for r in soft404_hosts(df, min_rate=0.5, min_pages=4).collect()]
    assert hosts == ["a.com"]
