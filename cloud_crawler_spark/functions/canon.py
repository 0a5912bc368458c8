"""URL canonicalization and link absolutization.

URL identity is THE identity function of the crawl. The canonical form
implemented here is the union of:

* the reference's ``key_for`` (redis_page_store.rb:34-36,
  redis_url_bloomfilter.rb:74-76): lowercase the whole URL, rewrite the
  ``https`` scheme to ``http``, squash whitespace runs to single spaces
  (verified by spec/redis_url_bloomfilter_spec.rb:42-44, 85-88);
* the reference's seed-side ``normalize_link`` (driver.rb:115-119):
  empty path becomes ``/``;
* the reference's link-side ``to_absolute`` (page.rb:232-244): strip
  the fragment, resolve relative hrefs against ``<base href>`` or the
  page URL (spec/page_spec.rb:149-202);
* the extended rules required at 10^10-frontier scale: strip default
  ports (``:80``/``:443``), sort query parameters.

Note: the reference's ``gsub("https", "http")`` replaces the substring
anywhere in the URL (lossy). We restrict the rewrite to the scheme —
the only behavior its specs exercise — so paths containing the literal
string "https" survive.

Both a pure-Python implementation (property tests, driver-side use) and
Arrow-batched pandas UDF wrappers (executor hot path) are provided.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# ---- hot-path fast paths -------------------------------------------------
# canonicalize/to_absolute run once per extracted LINK (~50x per page at
# Common-Crawl link density); the overwhelmingly common inputs are
# already-normal URLs for which the general machinery (strip, unquote/
# quote, urljoin, urlsplit, sort) is a provable no-op. The regexes below
# accept ONLY inputs where that holds — every admitted character is
# untouched by quote(unquote(.)) (unreserved or in the quote safe-set),
# there is no whitespace/fragment/query/percent-escape/port to rewrite,
# and the path is non-empty — so the fast return is byte-identical to
# the slow result (property-tested in tests/test_canon.py).
#   (';' excluded from the ABS class: urljoin drops an empty trailing
#   params segment — "http://x/a;" -> "http://x/a")
_FAST_ABS_RE = re.compile(r"^https?://[A-Za-z0-9.-]+/[A-Za-z0-9._~!$&'()*+,=:@/-]*$")
_FAST_CANON_RE = re.compile(r"^http://[a-z0-9.-]+/[a-z0-9._~!$&'()*+,;=:@/-]*$")
# intersection of the two (lowercase http, no ';'): an href matching
# this is its OWN abs_url and canon_url — resolve_parts collapses its
# three regex gates (to_absolute, canonicalize, canonical-shape) into
# this single match on the raw href. ~40% of the per-link kernel at
# Common-Crawl-style absolute-link density.
_FAST_RESOLVED_RE = re.compile(r"^http://[a-z0-9.-]+/[a-z0-9._~!$&'()*+,=:@/-]*$")


def strip_fragment(url: str) -> str:
    """Drop everything from '#' on (page.rb:232 strips the fragment so
    that ``<a href="#top">`` resolves to the page URL itself,
    spec/page_spec.rb:149-155)."""
    i = url.find("#")
    return url if i < 0 else url[:i]


def to_absolute(href: str, page_url: str, base_href: str | None = None) -> str | None:
    """Absolutize one extracted href against the page (or its <base>).

    Mirrors Page#to_absolute (page.rb:232-244): fragment strip, decode/
    re-encode, merge against <base href> if present else the page URL,
    empty path -> '/'. Returns None for empty/unresolvable hrefs.
    """
    if href is None:
        return None
    if _FAST_ABS_RE.match(href):
        return href  # already absolute+normal: the slow pipeline is a no-op
    return _to_absolute_slow(href, page_url, base_href)


def _to_absolute_slow(href: str, page_url: str, base_href: str | None = None) -> str | None:
    href = strip_fragment(href.strip())
    if href == "":
        # pure-fragment link resolves to the page itself (spec/page_spec.rb:149-155)
        href = ""
    base = base_href if base_href else page_url
    try:
        # decode-then-encode round trip (page.rb:236-237) — normalizes
        # stray encodings without double-encoding.
        href = quote(unquote(href), safe=":/?&=%~#+!$,;'@()*[]")
        absu = urljoin(base, href)
        parts = urlsplit(absu)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https"):
        return None
    path = parts.path or "/"
    return urlunsplit((parts.scheme, parts.netloc, path, parts.query, ""))


def canonicalize(url: str) -> str | None:
    """Canonical URL: whole-URL lowercase + https->http (reference
    key_for) + whitespace squash + fragment strip + default-port strip +
    sorted query params + empty path -> '/'."""
    if url is None:
        return None
    if _FAST_CANON_RE.match(url):
        return url  # already canonical: every rewrite below is a no-op
    return _canonicalize_slow(url)


def _canonicalize_slow(url: str) -> str | None:
    u = " ".join(url.split())  # \s+ -> ' ' then strip (key_for gsub(/\s+/,' '))
    if not u:
        return None
    u = u.lower()  # reference lowercases the WHOLE url (lossy, intentional)
    u = strip_fragment(u)
    try:
        parts = urlsplit(u)
    except ValueError:
        return None
    scheme = "http" if parts.scheme in ("http", "https") else parts.scheme
    try:
        host = parts.hostname or ""
        port = parts.port
    except ValueError:  # malformed netloc, e.g. '//::' (port=':')
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(parts.scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = parts.query
    if query:
        pairs = sorted(p for p in query.split("&") if p)
        query = "&".join(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def resolve_parts(
    href: str, page_url: str, base_href: str | None = None
) -> tuple[str | None, str | None, str | None, str | None]:
    """Fused per-link resolution: (abs_url, canon_url, host, path) in
    one call — the hot inner loop of the parse UDF. Equal by
    construction to to_absolute -> canonicalize -> host_of/path_of
    (which it calls on the slow path), but a canonical-shaped URL pays
    one regex match instead of three urlsplits."""
    if not isinstance(href, str):
        return None, None, None, None
    if _FAST_RESOLVED_RE.match(href):
        # already absolute AND canonical (and ';'-free, so urljoin's
        # empty-params-segment drop can't apply): one match, no calls
        i = href.index("/", 7)
        return href, href, href[7:i] or None, href[i:]
    a = to_absolute(href, page_url, base_href)
    if a is None:
        return None, None, None, None
    c = canonicalize(a)
    if c is None:
        return a, None, None, None
    if _FAST_CANON_RE.match(c):
        i = c.index("/", 7)  # len("http://") == 7
        return a, c, c[7:i] or None, c[i:]
    return a, c, host_of(c), path_of(c)


def host_of(url: str) -> str | None:
    try:
        return (urlsplit(url).hostname or "").lower() or None
    except ValueError:
        return None


def path_of(url: str) -> str:
    try:
        p = urlsplit(url)
    except ValueError:
        return "/"
    path = p.path or "/"
    if p.query:
        path = f"{path}?{p.query}"
    return path


# ---------------------------------------------------------------- UDFs
# Arrow-batched: one Python call per batch, vectorized over pandas
# Series (input_hint forbids per-row Python UDFs).


@pandas_udf(T.StringType())
def canon_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize, na_action="ignore")


@pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of, na_action="ignore")


@pandas_udf(T.StringType())
def path_udf(urls: pd.Series) -> pd.Series:
    return urls.map(path_of, na_action="ignore")


@pandas_udf(T.StringType())
def absolutize_udf(hrefs: pd.Series, page_urls: pd.Series, base_hrefs: pd.Series) -> pd.Series:
    out = [
        to_absolute(h, p, b if isinstance(b, str) and b else None)
        if isinstance(h, str) and isinstance(p, str)
        else None
        for h, p, b in zip(hrefs, page_urls, base_hrefs)
    ]
    return pd.Series(out, dtype="object")


_RESOLVED_TYPE = T.StructType(
    [
        T.StructField("abs_url", T.StringType()),
        T.StructField("canon_url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
    ]
)


@pandas_udf(_RESOLVED_TYPE)
def resolve_link_udf(hrefs: pd.Series, page_urls: pd.Series, base_hrefs: pd.Series) -> pd.DataFrame:
    """FUSED hot-path UDF: absolutize + canonicalize + host + path in a
    single Arrow round trip (chaining four scalar UDFs would serialize
    the batch through Python four times)."""
    abs_urls, canons, hosts, paths = [], [], [], []
    for h, p, b in zip(hrefs, page_urls, base_hrefs):
        a = (
            to_absolute(h, p, b if isinstance(b, str) and b else None)
            if isinstance(h, str) and isinstance(p, str)
            else None
        )
        c = canonicalize(a) if a else None
        abs_urls.append(a)
        canons.append(c)
        hosts.append(host_of(c) if c else None)
        paths.append(path_of(c) if c else None)
    return pd.DataFrame(
        {"abs_url": abs_urls, "canon_url": canons, "host": hosts, "path": paths}
    )


_CANON_TYPE = T.StructType(
    [T.StructField("canon_url", T.StringType()), T.StructField("host", T.StringType())]
)


@pandas_udf(_CANON_TYPE)
def canon_host_udf(urls: pd.Series) -> pd.DataFrame:
    canons = urls.map(canonicalize, na_action="ignore")
    hosts = canons.map(host_of, na_action="ignore")
    return pd.DataFrame({"canon_url": canons, "host": hosts})


def with_canon(df, url_col: str = "url", out_col: str = "canon_url"):
    """Attach canon_url + host columns to a DataFrame of URLs (one fused
    Arrow round trip)."""
    return (
        df.withColumn("_ch", canon_host_udf(F.col(url_col)))
        .withColumn(out_col, F.col("_ch.canon_url"))
        .withColumn("host", F.col("_ch.host"))
        .drop("_ch")
    )


# ad/analytics click-tracking query params (Google Analytics utm_*,
# Google/Facebook/Microsoft click ids, Mailchimp, HubSpot, Instagram,
# Yandex). Matched as a whole param name, with or without a value —
# "utmx=1" or "refid=2" never match.
_TRACKING_PARAM_RE = re.compile(
    r"^(?:utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|mc_cid|igshid"
    r"|yclid|_hsenc|_hsmi)(?:=|$)",
    re.IGNORECASE,  # raw seed/frontier URLs carry UTM_SOURCE=... too;
    # whole-name matching still excludes lookalikes either case
)


def strip_tracking_params(url: str | None) -> str | None:
    """Drop click-tracking query parameters (utm_*, gclid, fbclid, ...)
    from an already-canonical URL — the crawl-hygiene step that folds
    the same landing page reached from N ad campaigns into one frontier
    key. A pure filter over the param list: canonicalize()'s sorted
    param order is preserved, and a query that empties loses its '?'.

    NOT part of the default canonicalization: the reference's key_for
    (dsl_core.rb) keeps every param, and crawl-ordering parity pins
    that behavior — compose this explicitly (seed prep, dedup keys,
    frontier ingest) when tracking-noise collapse is wanted.
    """
    if url is None:
        return None
    i = url.find("?")
    if i < 0:
        return url
    base, query = url[:i], url[i + 1:]
    kept = [p for p in query.split("&") if p and not _TRACKING_PARAM_RE.match(p)]
    return base + ("?" + "&".join(kept) if kept else "")


@pandas_udf(T.StringType())
def strip_tracking_udf(urls: pd.Series) -> pd.Series:
    """Arrow-vectorized strip_tracking_params."""
    return urls.map(strip_tracking_params, na_action="ignore")


# ------------------------------------------------------------------ SURT
def surt_key(url) -> "F.Column":
    """Sort-friendly URI Reordering Transform of a canonical URL — the
    web-archive key format CDX indexes sort by (`com,example)/path`):
    scheme dropped, host labels reversed and comma-joined (non-default
    port kept after the host), then `)` + path + sorted query.

    Why it matters at 10^10 frontier scale: a SURT-sorted Iceberg
    frontier/page table clusters every page of a domain (and all its
    subdomains) into one contiguous key range, so per-domain operations
    — recrawl a site, export one domain's corpus slice, CDX prefix
    lookup — become partition-pruned range scans instead of full-table
    host filters. Expects `canonicalize()` output (lowercase, http,
    fragment-stripped); query params are (re)sorted here so the key is
    stable even for raw canonical-shaped inputs.

    Pure built-in string/array algebra — whole-stage codegen, no UDF,
    zero shuffle; the exact same algebra runs in the DuckDB oracle
    (q_surt_keys).
    """
    url = F.lit(url) if isinstance(url, str) else url
    rest = F.substring_index(url, "://", -1)  # host[:port]/path?query
    hostport = F.substring_index(rest, "/", 1)
    host = F.substring_index(hostport, ":", 1)
    port = F.when(
        F.contains(hostport, F.lit(":")),
        F.concat(F.lit(":"), F.substring_index(hostport, ":", -1)),
    ).otherwise(F.lit(""))
    pathq = F.substring(rest, F.length(hostport) + 1, F.length(rest))
    path = F.when(pathq == "", F.lit("/")).otherwise(
        F.substring_index(pathq, "?", 1)
    )
    query = F.when(
        F.contains(pathq, F.lit("?")), F.substring_index(pathq, "?", -1)
    ).otherwise(F.lit(""))
    sortedq = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")), "&"
    )
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        port,
        F.lit(")"),
        path,
        F.when(sortedq == "", F.lit("")).otherwise(F.concat(F.lit("?"), sortedq)),
    )


# <link rel=canonical> — attribute order varies in the wild, so both
# orders are matched; RE2-safe (no backrefs/lookaround) so the EXACT
# same patterns run in the DuckDB oracle (q_canonical_aliases).
REL_CANONICAL_RE = (
    r'(?i)<link\b[^>]*rel\s*=\s*["\']?canonical["\']?[^>]*'
    r'href\s*=\s*["\']?([^"\'\s>]+)'
)
HREF_CANONICAL_RE = (
    r'(?i)<link\b[^>]*href\s*=\s*["\']?([^"\'\s>]+)["\']?[^>]*'
    r'rel\s*=\s*["\']?canonical'
)


def canonical_href(html_col) -> "F.Column":
    """The raw href of a page's ``<link rel=canonical>`` declaration
    (either attribute order), or NULL when the page declares none.
    Pure regexp_extract — whole-stage codegen, no Python."""
    html_col = F.col(html_col) if isinstance(html_col, str) else html_col
    pick = lambda pat: F.nullif(  # noqa: E731
        F.regexp_extract(html_col, pat, 1), F.lit("")
    )
    return F.coalesce(pick(REL_CANONICAL_RE), pick(HREF_CANONICAL_RE))


def canonical_aliases(
    pages,
    url_col: str = "url",
    html_col: str = "html",
) -> "DataFrame":
    """rel=canonical alias resolution — the duplicate-URL collapse
    signal sites publish themselves (print views, session-id twins,
    m.-subdomain mirrors all declare one canonical URL). Output one
    row per page: (canon_url, canonical_target, is_alias) where
    canonical_target is the page's resolved+canonicalized declared
    target (itself when none is declared — the self-loop makes the
    table a total function usable as a dedup/frontier-collapse join
    dimension) and is_alias=1 iff the page points at a DIFFERENT url.
    Single-hop semantics (the standard search-engine treatment;
    chains of canonicals are not followed).

    Scale shape: extraction is one codegen regexp projection; the
    relative-href case routes through the existing absolutize/canon
    Arrow UDFs (per-row, zero shuffle) — no join, no explode, no
    driver state, so the pass is a pure map over the page store.
    """
    raw = canonical_href(html_col)
    url = F.col(url_col)
    target = F.coalesce(
        canon_udf(absolutize_udf(raw, url, F.lit(None).cast("string"))),
        canon_udf(url),
    )
    return pages.select(
        canon_udf(url).alias("canon_url"),
        target.alias("canonical_target"),
    ).select(
        "canon_url",
        "canonical_target",
        (F.col("canonical_target") != F.col("canon_url"))
        .cast("long")
        .alias("is_alias"),
    )


def url_template(url_col) -> "F.Column":
    """URL template key for pattern mining: digit runs collapse to
    '{n}' and query-parameter values to '=*', so shard hosts
    (h1/h2/h3.cdn.com), paginated paths (/page/2) and id-carrying
    params (?item=123&page=4) all land on one key. GroupBy this key to
    find crawler traps the per-URL heuristics miss (one template, ten
    million URLs), to budget frontiers per site SECTION instead of per
    host, and to pick representative URLs per template for recrawl
    sampling. Pure codegen string algebra (two regexp_replace passes),
    zero shuffle, no UDF — the same regexes run verbatim in the DuckDB
    oracle."""
    t = F.regexp_replace(url_col, "[0-9]+", "{n}")
    return F.regexp_replace(t, "=[^&#]*", "=*")


def dust_rules(
    docs: "DataFrame",
    url_col: str = "url",
    hash_col: str = "content_hash",
    max_aliases_per_hash: int = 50,
) -> "DataFrame":
    """DUST rule mining — "Do Not Crawl in the DUST: Different URLs
    with Similar Text" (Bar-Yossef, Keidar & Schonfeld, WWW 2007):
    from pairs of DISTINCT URLs serving identical content, learn which
    URL rewrite rules the site obeys, so the frontier can collapse
    aliases BEFORE fetching (the paper's point: dedup after fetch
    wastes the fetch). Emits per-rule support: how many alias pairs
    each rewrite explains, over how many hosts — rules with broad
    support become canonicalizer extensions (the engine's
    canonicalize() already hard-codes the universal ones; this mines
    the site-specific ones).

    Rules classified per same-content pair (directional, from the
    more-decorated to the plainer URL):
      strip_index_file  a = b + 'index.html'
      strip_slash       a = b + '/'
      https_to_http     a = b with https scheme
      strip_www         a = b with a www. host prefix
      other             same content, no mined rewrite explains it

    Scale shape: ONE self-join keyed on the 32-byte content hash —
    hashes with more than `max_aliases_per_hash` distinct URLs are
    excluded first (a hash shared by thousands of URLs is a template/
    soft-404 artifact, and the alias-pair fan-out is quadratic), then
    a codegen CASE classification and one map-side-combinable groupBy.
    No UDF, no explode.
    """
    u = docs.select(
        F.col(url_col).alias("u"), F.col(hash_col).alias("h")
    ).distinct()
    sz = u.groupBy("h").agg(F.count("*").alias("_n"))
    kept = (
        u.join(sz, "h")
        .where((F.col("_n") >= 2) & (F.col("_n") <= max_aliases_per_hash))
        .select("u", "h")
    )
    pairs = (
        kept.alias("L")
        .join(kept.alias("R"), F.expr("L.h = R.h"))
        .where(F.expr("L.u < R.u"))
        .select(F.expr("L.u").alias("a"), F.expr("R.u").alias("b"))
    )
    rule = (
        F.when(
            (F.col("a") == F.concat(F.col("b"), F.lit("index.html")))
            | (F.col("b") == F.concat(F.col("a"), F.lit("index.html"))),
            F.lit("strip_index_file"),
        )
        .when(
            (F.col("a") == F.concat(F.col("b"), F.lit("/")))
            | (F.col("b") == F.concat(F.col("a"), F.lit("/"))),
            F.lit("strip_slash"),
        )
        .when(
            (F.regexp_replace("a", "^https://", "http://") == F.col("b"))
            | (F.regexp_replace("b", "^https://", "http://") == F.col("a")),
            F.lit("https_to_http"),
        )
        .when(
            (F.regexp_replace("a", "^(https?://)www\\.", "$1") == F.col("b"))
            | (F.regexp_replace("b", "^(https?://)www\\.", "$1")
               == F.col("a")),
            F.lit("strip_www"),
        )
        .otherwise(F.lit("other"))
    )
    host = F.regexp_extract("a", "^https?://([^/?#]+)", 1)
    return (
        pairs.select(rule.alias("rule"), host.alias("_host"))
        .groupBy("rule")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("_host").alias("n_hosts"),
        )
    )


# ------------------------------------------- registrable domain (eTLD+1)

# Snapshot SUBSET of the Mozilla Public Suffix List (publicsuffix.org)
# covering the shapes the tests exercise: 1-label ccTLD/gTLDs, 2-label
# registry suffixes, and multi-label PRIVATE-section suffixes
# (github.io, s3.amazonaws.com). A production deployment swaps in the
# full ~9k-rule list — the operator below is already the broadcast
# dim-table join that the full list needs (same pattern as the robots
# rules table, operators/robots.py); only this constant grows.
PSL_SNAPSHOT = [
    "com", "org", "net", "io", "edu", "gov", "info",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "ac.jp", "co.jp", "ne.jp",
    "au", "com.au", "org.au", "net.au",
    "br", "com.br", "de", "fr", "nl", "us",
    "github.io", "blogspot.com", "s3.amazonaws.com",
]


def psl_rules(spark, suffixes=None):
    """(suffix, nlabels) rule table from a public-suffix snapshot —
    the broadcast dimension side of registrable-domain extraction."""
    sufs = sorted(set(suffixes if suffixes is not None else PSL_SNAPSHOT))
    return spark.createDataFrame(
        [(s, s.count(".") + 1) for s in sufs], "suffix string, nlabels int"
    )


def with_registrable_domain(df, host_col: str = "host", rules=None):
    """Add (public_suffix, registrable_domain) columns via longest-
    public-suffix match (the PSL algorithm, exact rules only — the
    rare wildcard/exception rules of the full list are out of this
    snapshot's scope; unknown TLDs take the PSL's implicit ``*`` rule,
    i.e. the last label is the suffix). A host that IS a public suffix
    gets NULL registrable_domain, per the PSL spec.

    Scale shape: candidate suffixes (last 1..3 labels, JVM string
    algebra) are resolved per DISTINCT host — the host->domain map is
    corpus-cardinality-free — with the rule table broadcast, then
    joined back on host. No Python runs anywhere.
    """
    spark = df.sparkSession
    if rules is None:
        rules = psl_rules(spark)

    hosts = df.select(F.col(host_col).alias("_rd_host")).distinct()
    labels = F.split(F.lower(F.col("_rd_host")), "\\.")
    n = F.size(labels)
    hl = hosts.select(
        "_rd_host",
        F.explode(
            F.filter(
                F.array(*[
                    F.when(
                        n >= k,
                        F.concat_ws(".", F.slice(labels, n - k + 1, k)),
                    )
                    for k in (1, 2, 3)
                ]),
                lambda s: s.isNotNull(),
            )
        ).alias("suffix"),
    )
    best = (
        hl.join(F.broadcast(rules), "suffix")
        .groupBy("_rd_host")
        .agg(F.max("nlabels").alias("_k"))
    )
    labels2 = F.split(F.lower(F.col("_rd_host")), "\\.")
    n2 = F.size(labels2)
    k = F.coalesce(F.col("_k"), F.lit(1))
    hostmap = (
        hosts.join(best, "_rd_host", "left")
        .select(
            "_rd_host",
            F.concat_ws(".", F.slice(labels2, n2 - k + 1, k))
            .alias("public_suffix"),
            F.when(
                n2 > k,
                F.concat_ws(".", F.slice(labels2, n2 - k, k + 1)),
            ).alias("registrable_domain"),
        )
    )
    return df.join(
        hostmap.withColumnRenamed("_rd_host", host_col), host_col, "left"
    )


def url_equivalence(
    edges: "DataFrame",
    urls: "DataFrame | None" = None,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_iter: int = 20,
) -> "DataFrame":
    """URL equivalence classes over the union of duplicate-URL
    signals — redirect hops, rel=canonical declarations
    (canonical_aliases), DUST rule aliases — treated as one undirected
    alias graph and collapsed by connected components. The collapse
    step every signal above feeds: canonical_aliases is single-hop and
    redirects are per-chain, but real duplicate families MIX signals
    (m-dot page -> canonical -> redirect), and only the transitive
    closure collapses the whole family to one frontier entry.

    edges: (src_col, dst_col) alias pairs from any mix of signals.
    urls: optional universe; URLs absent from every edge come back as
    their own representative, making the output a total function.

    Returns (url, rep_url, is_rep int) — rep_url is the
    lexicographically smallest member (deterministic and
    engine-portable; plug a different election by re-labelling
    rep_url downstream, the classes themselves don't change).

    Scale shape: inherits connected_components — O(diameter)
    min-label rounds, one equi-join + one groupBy each, per-round
    localCheckpoint; alias families are shallow (diameter 2-4). The
    isolated-URL fold-in is one LEFT ANTI join."""
    from cloud_crawler_spark.operators.dedup import connected_components

    comp = connected_components(edges, src_col, dst_col, max_iter=max_iter)
    out = comp.select(
        F.col("id").alias("url"), F.col("label").alias("rep_url")
    )
    if urls is not None:
        ucol = urls.columns[0]
        iso = (
            urls.select(F.col(ucol).alias("url")).distinct()
            .join(out, "url", "left_anti")
            .select("url", F.col("url").alias("rep_url"))
        )
        out = out.unionByName(iso)
    return out.select(
        "url", "rep_url",
        (F.col("url") == F.col("rep_url")).cast("long").alias("is_rep"),
    )
