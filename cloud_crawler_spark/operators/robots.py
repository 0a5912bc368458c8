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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


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


def parse_crawl_delay(body: str) -> float | None:
    """robots.txt body -> Crawl-delay (seconds) for the User-agent: *
    group, or None. Same group-selection logic as parse_robots_body
    (the Robotex gem exposes the same directive as `#delay`)."""
    delay: float | None = None
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
        elif key == "crawl-delay" and (applies or not seen_any_group):
            try:
                d = float(val)
            except ValueError:
                continue
            if d > 0:
                delay = d
    return delay


def pattern_regex(pat: str) -> str:
    """RFC 9309 wildcard pattern -> anchored Java regex, or '' for a
    plain prefix (the fast startswith path). ``*`` matches any
    character run; a trailing ``$`` anchors the path end. The 2013
    reference's Robotex predates wildcard adoption; modern robots.txt
    uses them heavily (``Disallow: /*.php$``), and treating them as
    literal prefixes silently mis-gates."""
    if "*" not in pat and not pat.endswith("$"):
        return ""
    end = pat.endswith("$")
    core = pat[:-1] if end else pat
    out = []
    for ch in core:
        if ch == "*":
            out.append(".*")
        elif ch in ".^$+?()[]{}|\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if end else "")


_RULES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("prefix", T.StringType()),
            T.StructField("allow", T.BooleanType()),
            # anchored regex for wildcard rules, '' for plain prefixes
            T.StructField("regex", T.StringType()),
        ]
    )
)


@pandas_udf(_RULES_TYPE)
def parse_robots_udf(bodies: pd.Series) -> pd.Series:
    """Arrow-batched robots.txt body parser (executor-side)."""
    return pd.Series(
        [
            [
                {"prefix": p, "allow": a, "regex": pattern_regex(p)}
                for p, a in parse_robots_body(b)
            ]
            for b in bodies
        ],
        dtype="object",
    )


@pandas_udf(T.DoubleType())
def crawl_delay_udf(bodies: pd.Series) -> pd.Series:
    """Arrow-batched Crawl-delay extractor (executor-side)."""
    return pd.Series(
        [parse_crawl_delay(b) for b in bodies], dtype="float64"
    )


def crawl_delays(robots_df: DataFrame | None) -> DataFrame | None:
    """robots(host, body) -> (host, crawl_delay double) for hosts that
    declare a positive Crawl-delay. Executor-side parse, tiny output."""
    if robots_df is None:
        return None
    return (
        robots_df.select("host", crawl_delay_udf(F.col("body")).alias("crawl_delay"))
        .where(F.col("crawl_delay").isNotNull())
    )


def delay_budgets(delays: DataFrame | None, window_sec: float) -> DataFrame | None:
    """Translate per-host Crawl-delay into the batch engine's politeness
    currency: a per-host fetch budget per round. One round stands in for
    ``window_sec`` seconds of wall clock, so a host asking for one fetch
    every ``d`` seconds gets ``max(1, floor(window_sec / d))`` fetches
    per round (never 0 — progress stays guaranteed; a delay larger than
    the window just degrades to one fetch per round).

    Output (host, budget int) joins into select_budget as a broadcast
    dimension — the reference's per-worker ``sleep(delay)``
    (batch_job.rb:181) re-expressed set-at-a-time."""
    if delays is None:
        return None
    return delays.select(
        "host",
        F.greatest(
            F.lit(1),
            F.floor(F.lit(float(window_sec)) / F.col("crawl_delay")),
        ).cast("int").alias("budget"),
    )


def fetch_robots(hosts: DataFrame, transport_factory,
                 n_partitions: int | None = None,
                 scheme: str = "http") -> DataFrame:
    """Live robots.txt fetch: hosts(host) -> robots(host, body).

    The live twin of the corpus `robots` table (reference: the Robotex
    gem fetches each host's robots.txt on first use,
    dsl_core.rb:237-241). Same transport contract as HttpFetcher (S6):
    one transport instance per host-partition, so robots fetches share
    the crawl's connection-locality model. Distributed end to end —
    hosts stay a DataFrame, bodies never pass through the driver.

    Semantics per host:
      2xx  -> the served body (parsed by build_rules later);
      other codes (incl. 404) -> NO row — a missing robots.txt allows
        everything (Robotex behavior, and spec/crawl_job_spec.rb's
        robots-less hosts crawl freely);
      transport exception -> a synthetic disallow-all body — the
        reference's `rescue -> false` (dsl_core.rb:240) turns a robots
        FAILURE into "disallowed", and so do we.
    """
    out_schema = T.StructType(
        [T.StructField("host", T.StringType()), T.StructField("body", T.StringType())]
    )

    def gen(pdfs):
        transport = transport_factory()
        for pdf in pdfs:
            rows = []
            for host in pdf["host"]:
                if not host:
                    continue
                url = f"{scheme}://{host}/robots.txt"
                try:
                    resp = transport(url, None, None)
                except Exception:  # noqa: BLE001 — rescue->false parity
                    rows.append((host, "User-agent: *\nDisallow: /"))
                    continue
                if resp.code and 200 <= resp.code < 300 and resp.body is not None:
                    body = resp.body
                    if isinstance(body, (bytes, bytearray)):
                        body = bytes(body).decode("utf-8", errors="ignore")
                    rows.append((host, body))
            yield pd.DataFrame(rows, columns=["host", "body"])

    h = hosts.select("host").distinct()
    # default the fan-out to the core count, not sql.shuffle.partitions:
    # the per-round new-host set is typically tiny, and a bare
    # repartition("host") would spawn ~200 near-empty tasks, each
    # paying transport_factory() setup for a handful of hosts
    n_partitions = n_partitions or hosts.sparkSession.sparkContext.defaultParallelism
    h = h.repartition(n_partitions, "host")
    return h.mapInPandas(gen, out_schema)


def build_rules(spark, robots_df: DataFrame | None) -> DataFrame:
    """robots(host, body) -> rules(host, prefix, allow, prefix_len).

    Bodies are parsed EXECUTOR-side in an Arrow-batched UDF — a
    Common-Crawl-scale corpus has millions of robots hosts, so the
    bodies never pass through the driver. (The gate-side join decides
    separately whether the aggregated per-host rules are small enough
    to broadcast; see `filter_allowed`.)
    """
    schema = (
        "host string, prefix string, allow boolean, prefix_len int, "
        "regex string"
    )
    if robots_df is None:
        return spark.createDataFrame([], schema)
    return (
        robots_df.select("host", F.explode(parse_robots_udf(F.col("body"))).alias("_r"))
        .select(
            "host",
            F.col("_r.prefix").alias("prefix"),
            F.col("_r.allow").alias("allow"),
            # specificity = raw pattern length (the Google/RFC 9309
            # longest-match convention counts the pattern, wildcards
            # included)
            F.length("_r.prefix").alias("prefix_len"),
            F.col("_r.regex").alias("regex"),
        )
    )


def filter_allowed(
    candidates: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    broadcast: bool = True,
) -> DataFrame:
    """Keep rows whose (host, path) is robots-allowed.

    Zero-shuffle on the big side: rules are pre-aggregated to one array
    per host (tiny), BROADCAST-joined on host, and the longest-match
    rule is picked per row with JVM higher-order array functions
    (F.filter + F.array_max over (prefix_len, allow) structs) — fully
    inside whole-stage codegen, no Python in the hot path.

    `broadcast=False` (the caller saw a rules table too big to ship to
    every executor — millions of hosts): same plan with a shuffle hash
    join on host instead of the broadcast.
    """
    if rules.isEmpty():
        return candidates
    per_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list(F.struct("prefix_len", "allow", "prefix", "regex")).alias("_rset")
    )
    if broadcast:
        per_host = F.broadcast(per_host)
    joined = candidates.join(per_host, F.col(host_col) == F.col("_rhost"), "left")
    # plain prefixes take the startswith fast path; RFC 9309 wildcard
    # rules (*, trailing $) match their anchored regex — still JVM-side
    # (regexp_like accepts a per-element pattern), still codegen
    matched = F.filter(
        F.coalesce(F.col("_rset"), F.array()),
        lambda r: F.when(
            r["regex"] != "", F.regexp_like(F.col(path_col), r["regex"])
        ).otherwise(F.col(path_col).startswith(r["prefix"])),
    )
    best = F.array_max(matched)  # struct order: prefix_len, then allow=true wins ties
    return (
        joined.withColumn("_robots_ok", F.coalesce(best["allow"], F.lit(True)))
        .where(F.col("_robots_ok"))
        .drop("_rhost", "_rset", "_robots_ok")
    )


# ------------------------------------------------------- Sitemap discovery


def sitemap_urls(robots_df: DataFrame) -> DataFrame:
    """robots(host, body) -> (host, sitemap_url): the ``Sitemap:``
    cross-reference directive (sitemaps.org). Per the robots spec the
    directive is GLOBAL — independent of any User-agent group — so this
    is a plain line extraction, not group-scoped parsing. Pure codegen
    (regexp_extract_all over the body), no Python; feed the result
    (or its ``sitemap_url`` column) to sources/sitemap.sitemap_seeds
    as roots for a robots-bootstrapped seed list."""
    body = F.col("body").cast("string")
    return (
        robots_df.select(
            "host",
            F.explode(
                F.regexp_extract_all(
                    body, F.lit(r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"), 1
                )
            ).alias("sitemap_url"),
        )
        .where(F.col("sitemap_url") != "")
        .distinct()
    )
