"""robots.txt gating as a broadcast dimension-table join.

Reference: the `allowed` predicate (dsl_core.rb:237-241) calls the
Robotex gem per link when `obey_robots_txt` is set (default true,
dsl_front_end.rb:42); a parse failure means "disallow" (rescue->false).
Spec parity: spec/crawl_job_spec.rb:194-207 (Disallow: /1 => page 1 not
stored).

Here robots.txt bodies live in a small `robots(host, body)` dimension
table. `build_rules` parses each body once (driver/executor side, tiny
table) into prefix rules; `filter_allowed` gates candidate URLs with a
BROADCAST join on host + a longest-match-wins prefix check — no
per-link Python, no shuffle of the big side.

Rule semantics (User-agent: * group, like the reference's default UA
behavior): collect Allow/Disallow path prefixes; a URL is allowed iff
the longest matching prefix is an Allow (or nothing matches). Empty
Disallow means allow-all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots_body(body: str) -> list[tuple[str, bool]]:
    """robots.txt body -> [(path_prefix, allow)] for User-agent: *.

    Minimal, deterministic parser covering the reference's usage
    (FakePage robots bodies are `User-agent: *\\nDisallow: /p`)."""
    rules: list[tuple[str, bool]] = []
    applies = False
    seen_any_group = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
            seen_any_group = True
        elif key in ("allow", "disallow") and (applies or not seen_any_group):
            if val == "" and key == "disallow":
                continue  # empty Disallow = allow all
            rules.append((val, key == "allow"))
    return rules


def build_rules(spark, robots_df: DataFrame | None) -> DataFrame:
    """robots(host, body) -> rules(host, prefix, allow, prefix_len)."""
    schema = "host string, prefix string, allow boolean, prefix_len int"
    if robots_df is None:
        return spark.createDataFrame([], schema)
    rows = robots_df.select("host", "body").collect()  # dim table: small
    out = []
    for r in rows:
        for prefix, allow in parse_robots_body(r["body"]):
            out.append((r["host"], prefix, allow, len(prefix)))
    return spark.createDataFrame(out, schema)


def filter_allowed(
    candidates: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Keep rows whose (host, path) is robots-allowed.

    Zero-shuffle on the big side: rules are pre-aggregated to one array
    per host (tiny), BROADCAST-joined on host, and the longest-match
    rule is picked per row with JVM higher-order array functions
    (F.filter + F.array_max over (prefix_len, allow) structs) — fully
    inside whole-stage codegen, no Python in the hot path.
    """
    if rules.isEmpty():
        return candidates
    per_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list(F.struct("prefix_len", "allow", "prefix")).alias("_rset")
    )
    joined = candidates.join(
        F.broadcast(per_host), F.col(host_col) == F.col("_rhost"), "left"
    )
    matched = F.filter(
        F.coalesce(F.col("_rset"), F.array()),
        lambda r: F.col(path_col).startswith(r["prefix"]),
    )
    best = F.array_max(matched)  # struct order: prefix_len, then allow=true wins ties
    return (
        joined.withColumn("_robots_ok", F.coalesce(best["allow"], F.lit(True)))
        .where(F.col("_robots_ok"))
        .drop("_rhost", "_rset", "_robots_ok")
    )
