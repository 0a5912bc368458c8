"""Live-HTTP fetch stage (S4/S5/S6) — the injectable mapInPandas fetcher.

Re-expresses the reference's fetch substrate on Spark:

* ``HTTP#fetch_pages`` redirect loop (http.rb:68-91, 155-169):
  followed per URL inside the UDF, bounded by ``redirect_limit``
  (http.rb:35), same-host-or-relative only (``allowed?``,
  http.rb:245-247), every hop emitted when ``keep_redirects``.
* 3 retries with connection refresh (http.rb:211-216): per-request
  retry loop; a fresh transport call IS the refreshed connection.
* per-host connection pool (http.rb:219-240): the frontier slice is
  repartitioned by host before the UDF, so one Python worker sees one
  host's URLs consecutively and the transport's keep-alive session is
  reused across them — partition locality replaces the pool dict.
* error semantics (http.rb:89, spec/http_spec.rb:33-55): an exception
  after the retries yields a stored row with ``error`` set,
  ``code`` NULL and ``fetched=false`` (reference: ``fetched =
  !code.nil?``). A real 404/5xx response is a FETCHED page with that
  code — unlike the corpus join, where a missing row means the URL
  does not exist anywhere and lands as code=404/fetched=false.

The sandbox has no network, so the TRANSPORT is injectable: tests run
an in-process fake (tests/test_fetch_parity.py,
tests/test_round3_features.py), and ``UrllibTransport`` (per-partition
opener reuse, no auto-redirect, optional proxy) is the real-world
default. Output schema matches the corpus fetch stage
(plans/round._fetch) column-for-column, so

    config = CrawlConfig(fetcher=HttpFetcher(transport_factory=...))

swaps the stage without touching the round pipeline.
"""

from __future__ import annotations

import functools
import time
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloud_crawler_spark.functions.canon import canonicalize, host_of, to_absolute

#: columns the fetch stage appends to the frontier slice (must stay in
#: sync with plans/round._fetch's landed/hop selects)
FETCH_COLS = T.StructType(
    [
        T.StructField("code", T.IntegerType()),
        T.StructField("redirect_to", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("fetched", T.BooleanType()),
        T.StructField("content_type", T.StringType()),
        # full response headers, lowercased keys, multi-valued — the
        # Net::HTTPResponse#to_hash shape page.rb:255-268 serializes
        T.StructField("headers", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
        T.StructField("response_time", T.IntegerType()),
        T.StructField("error", T.StringType()),
        T.StructField("hop", T.IntegerType()),
    ]
)

_REWRITTEN = ("url", "canon_url", "host")  # columns redirect hops rewrite


@dataclass
class FetchResponse:
    """What a transport returns for one GET (http.rb:93-153 get/get_response)."""

    code: int
    body: Optional[bytes] = None
    content_type: Optional[str] = None
    redirect_to: Optional[str] = None  # Location header on 3xx
    response_time: int = 0             # milliseconds
    set_cookie: Optional[str] = None   # Set-Cookie header (http.rb:196)
    # full response headers, lowercased keys -> value list (the
    # Net::HTTPResponse#to_hash shape the reference stores whole,
    # page.rb:255-268). None => reconstructed from content_type.
    headers: Optional[dict] = None
    # body was cut at a byte budget (transport-side cap) — recorded in
    # the stored headers map as WARC-Truncated: length (ISO 28500)
    truncated: bool = False


def _headers_to_hash(msg) -> dict:
    """email.message.Message -> {lowercase_key: [values...]} — the
    Net::HTTPResponse#to_hash shape (page.rb:255-268)."""
    out: dict = {}
    for k in msg.keys():
        lk = k.lower()
        if lk not in out:
            out[lk] = msg.get_all(k) or []
    return out


def _maybe_gunzip(body: Optional[bytes], encoding: Optional[str],
                  max_bytes: Optional[int] = None,
                  raw_truncated: bool = False) -> tuple[Optional[bytes], bool]:
    """Transparently decompress a gzip response body; returns
    (decoded_body, truncated). The stored page bytes are ALWAYS the
    decoded document (the byte-identical extracted-text contract
    applies to content, not transfer coding); the headers hash keeps
    Content-Encoding as received. A corrupt or truncated gzip stream
    raises (gzip.decompress parity, incl. multi-member streams) —
    surfaced as a fetch error into the retry loop — UNLESS
    ``raw_truncated`` says the CALLER cut the compressed read at its
    own byte cap, in which case the partial decode is returned with
    truncated=True instead of punishing the fetch with retries.

    max_bytes bounds the DECODED size (zlib streaming decompress with
    max_length, member by member) — the decompression-bomb guard: a
    10 MB transfer that inflates to 10 GB stops at the cap inside the
    python worker instead of taking the executor down."""
    if body and encoding and encoding.strip().lower() == "gzip":
        import zlib

        out = bytearray()
        data = body
        while True:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)  # gzip wrapper
            if max_bytes is None:
                out += d.decompress(data)
            else:
                chunk = d.decompress(data, max_bytes + 1 - len(out))
                out += chunk
                while (len(out) <= max_bytes and d.unconsumed_tail
                       and not d.eof):
                    out += d.decompress(
                        d.unconsumed_tail, max_bytes + 1 - len(out)
                    )
                if len(out) > max_bytes:
                    return bytes(out[:max_bytes]), True
            if not d.eof:
                # stream ends mid-member: OUR capped read -> partial
                # page, flagged; anything else -> error (gzip parity)
                if raw_truncated:
                    return bytes(out), True
                raise EOFError(
                    "Compressed file ended before the end-of-stream "
                    "marker was reached"
                )
            # RFC 1952 multi-member: keep decoding (gzip.decompress
            # parity); trailing zero padding is legal and ignored
            data = d.unused_data.lstrip(b"\x00")
            if not data:
                return bytes(out), False
    if max_bytes is not None and body and len(body) > max_bytes:
        return body[:max_bytes], True
    return body, False


class UrllibTransport:
    """Default real-network transport: one urllib opener per instance
    (instantiated once per partition => keep-alive/session reuse along
    the host-partitioned slice), redirects surfaced as FetchResponse
    fields instead of being auto-followed (the crawl gate decides).

    ``timeout`` is the reference's ``:read_timeout`` knob and
    ``proxy_host``/``proxy_port`` its ``:proxy_host``/``:proxy_port``
    (dsl_front_end.rb:55-60); with no proxy configured, urllib's
    default env-based proxy resolution applies.

    ``max_body_bytes`` caps both the socket read AND the gzip-decoded
    size (streaming zlib) — the per-response memory bound a worker
    needs against multi-GB bodies and decompression bombs. An
    over-cap body comes back truncated with ``FetchResponse.
    truncated=True`` (stored as WARC-Truncated: length, ISO 28500)."""

    def __init__(self, timeout: float = 30.0, user_agent: str = "cloud-crawler-spark",
                 proxy_host: Optional[str] = None, proxy_port: Optional[int] = None,
                 accept_gzip: bool = True, max_body_bytes: Optional[int] = None):
        import urllib.request

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None  # surface the 3xx to the caller

        self.timeout = timeout
        self.user_agent = user_agent
        self.accept_gzip = accept_gzip
        self.max_body_bytes = max_body_bytes
        handlers: list = [_NoRedirect()]
        if proxy_host:
            proxy = f"http://{proxy_host}:{proxy_port or 8080}"
            handlers.append(
                urllib.request.ProxyHandler({"http": proxy, "https": proxy})
            )
        self.opener = urllib.request.build_opener(*handlers)

    def __call__(self, url: str, referer: Optional[str],
                 headers: Optional[dict] = None) -> FetchResponse:
        import urllib.error
        import urllib.request

        hdrs = {"User-Agent": self.user_agent}
        if self.accept_gzip:
            # html compresses ~5x; urllib sends no Accept-Encoding by
            # default, so every transfer would be identity-encoded
            hdrs["Accept-Encoding"] = "gzip"
        if referer:
            hdrs["Referer"] = referer
        if headers:
            hdrs.update(headers)  # fetcher-provided UA/Cookie win
        req = urllib.request.Request(url, headers=hdrs)
        t0 = time.monotonic()
        cap = self.max_body_bytes
        try:
            resp = self.opener.open(req, timeout=self.timeout)
            raw = resp.read(cap + 1) if cap is not None else resp.read()
            # capped COMPRESSED read: the gzip stream is incomplete, so
            # the decode is partial even when it lands under the cap
            raw_over = cap is not None and len(raw) > cap
            body, truncated = _maybe_gunzip(
                raw, resp.headers.get("Content-Encoding"), max_bytes=cap,
                raw_truncated=raw_over,
            )
            truncated = truncated or raw_over
            ms = int((time.monotonic() - t0) * 1000)
            return FetchResponse(
                code=resp.getcode(),
                body=body,
                content_type=(resp.headers.get("Content-Type") or "").split(";")[0] or None,
                response_time=ms,
                set_cookie=resp.headers.get("Set-Cookie"),
                headers=_headers_to_hash(resp.headers),
                truncated=truncated,
            )
        except urllib.error.HTTPError as e:  # non-2xx WITH a response
            ms = int((time.monotonic() - t0) * 1000)
            if e.code not in range(300, 400):
                raw = e.read(cap + 1) if cap is not None else e.read()
                raw_over = cap is not None and len(raw) > cap
                body, truncated = _maybe_gunzip(
                    raw, e.headers.get("Content-Encoding"), max_bytes=cap,
                    raw_truncated=raw_over,
                )
                truncated = truncated or raw_over
            else:
                body, truncated = None, False
            return FetchResponse(
                code=e.code,
                body=body,
                content_type=(e.headers.get("Content-Type") or "").split(";")[0] or None,
                redirect_to=e.headers.get("Location"),
                response_time=ms,
                set_cookie=e.headers.get("Set-Cookie"),
                headers=_headers_to_hash(e.headers),
                truncated=truncated,
            )


class DictTransport:
    """In-process FakeWeb analog (spec/fakeweb_helper.rb:21-93): a
    dict of url -> FetchResponse kwargs. The unit-test transport —
    lives in the package (not the test tree) so Spark python workers
    can unpickle it by reference.

    fail_first: raise on the first N calls of THIS instance (one
    instance per partition), then serve — exercises the retry loop.
    A url absent from the dict serves a real 404 response (live
    semantics: fetched page with code 404, unlike a corpus miss).
    echo_headers: append an HTML comment carrying the request's
    User-Agent/Cookie headers to every served body, so tests can
    assert what was actually SENT from the stored page bytes
    (fakeweb can't see into the python worker otherwise).
    """

    def __init__(self, site: dict, fail_first: int = 0, echo_headers: bool = False):
        self.site = site
        self.fail_first = fail_first
        self.echo_headers = echo_headers
        self.calls = 0

    def __call__(self, url: str, referer: Optional[str],
                 headers: Optional[dict] = None) -> FetchResponse:
        self.calls += 1
        if self.calls <= self.fail_first:
            raise ConnectionError("transient connect failure")
        spec = self.site.get(url)
        if spec is None:
            resp = FetchResponse(
                code=404, body=b"nope", content_type="text/html", response_time=1
            )
        else:
            resp = FetchResponse(**spec)
        if self.echo_headers and resp.body is not None:
            h = headers or {}
            marker = (
                f"<!--UA={h.get('User-Agent', '')}"
                f";Cookie={h.get('Cookie', '')}-->"
            )
            resp = FetchResponse(**{**resp.__dict__, "body": resp.body + marker.encode()})
        return resp


class BasicAuthTransport:
    """In-process 401/200 auth pair (spec/fakeweb_helper.rb:83-89): a
    url in `site` serves 401 without an Authorization header and 200
    (body echoes the header) with one. Lives in the package so Spark
    python workers can unpickle it by reference."""

    def __init__(self, site: dict):
        self.site = site

    def __call__(self, url: str, referer: Optional[str],
                 headers: Optional[dict] = None) -> FetchResponse:
        h = headers or {}
        if url in self.site and not h.get("Authorization"):
            return FetchResponse(code=401, body=b"denied", content_type="text/html")
        if url in self.site:
            body = f"<html>authed:{h['Authorization']}</html>".encode()
            return FetchResponse(code=200, body=body, content_type="text/html")
        return FetchResponse(code=404, body=b"nope", content_type="text/html")


class ConditionalTransport:
    """304 Not Modified test double for conditional revisit GETs: a
    dict url -> {body, etag, last_modified}. Serves 304 with no body
    when the request presents a matching If-None-Match /
    If-Modified-Since validator, else the full 200 carrying the
    validators as response headers. Lives in the package so Spark
    python workers can unpickle it by reference."""

    def __init__(self, site: dict):
        self.site = site

    def __call__(self, url: str, referer: Optional[str],
                 headers: Optional[dict] = None) -> FetchResponse:
        h = headers or {}
        spec = self.site.get(url)
        if spec is None:
            return FetchResponse(code=404, body=b"nope", content_type="text/html")
        etag, lm = spec.get("etag"), spec.get("last_modified")
        hdrs: dict = {"content-type": ["text/html"]}
        if etag:
            hdrs["etag"] = [etag]
        if lm:
            hdrs["last-modified"] = [lm]
        if (etag and h.get("If-None-Match") == etag) or (
            lm and h.get("If-Modified-Since") == lm
        ):
            return FetchResponse(
                code=304, body=None, content_type=None,
                headers=hdrs, response_time=1,
            )
        return FetchResponse(
            code=200, body=spec.get("body", b"<html></html>"),
            content_type="text/html", headers=hdrs, response_time=1,
        )


class FailingTransport:
    """Transport whose host is always down — every call raises."""

    def __call__(self, url: str, referer: Optional[str],
                 headers: Optional[dict] = None) -> FetchResponse:
        raise TimeoutError("host unreachable")


class HttpFetcher:
    """Callable fetch stage: (selected_frontier_df, config) -> fetched_df.

    transport_factory: zero-arg picklable callable returning a
    transport ``(url, referer, headers) -> FetchResponse`` — built ONCE
    per partition (the connection-pool analog). retries/redirect gating
    per the module docstring. ``delay`` sleeps between consecutive
    requests within a partition — the reference's per-job politeness
    sleep (batch_job.rb:181) localized to the host partition.

    Cookie/UA opts (live-fetch only; meaningless in corpus mode, which
    is why they live here and not on CrawlConfig):

    * ``cookies``: initial name->value jar, one CookieStore copy per
      host per partition (opts_helper default ``:cookies => nil``).
    * ``accept_cookies``: merge each response's Set-Cookie into the
      host's jar and send it on subsequent same-host requests —
      http.rb:196 / opts ``:accept_cookies`` (default false there too).
    * ``user_agent``: fixed UA header for every request.
    * ``agent_seed``: draw a DETERMINISTIC per-host UA from the six
      mozilla_agents.rb families instead (functions/cookies.agent_for);
      overrides user_agent. The reference randomizes per client
      (mozilla_agents.rb:33-54); seeding keeps the engine's
      same-input-same-crawl guarantee.
    """

    def __init__(
        self,
        transport_factory: Callable[[], Callable] = UrllibTransport,
        retries: int = 3,               # http.rb:211-216
        delay: float = 0.0,             # batch_job.rb:181 sleep(delay)
        n_partitions: Optional[int] = None,
        cookies: Optional[dict] = None,         # opts_helper :cookies
        accept_cookies: bool = False,           # opts_helper :accept_cookies
        user_agent: Optional[str] = None,       # opts_helper :user_agent
        agent_seed: Optional[int] = None,       # mozilla_agents.rb:33-54, seeded
        credentials: Optional[dict] = None,     # host -> (user, pass); 401 => Basic retry
        read_timeout: Optional[float] = None,   # dsl_front_end.rb :read_timeout
        proxy_host: Optional[str] = None,       # dsl_front_end.rb :proxy_host
        proxy_port: Optional[int] = None,       # dsl_front_end.rb :proxy_port
        max_content_bytes: Optional[int] = None,  # per-response body budget
        circuit_break_after: Optional[int] = None,  # per-host failure trip wire
    ):
        if transport_factory is UrllibTransport and (
            read_timeout is not None or proxy_host or max_content_bytes is not None
        ):
            transport_factory = functools.partial(
                UrllibTransport,
                timeout=read_timeout if read_timeout is not None else 30.0,
                proxy_host=proxy_host,
                proxy_port=proxy_port,
                max_body_bytes=max_content_bytes,
            )
        self.transport_factory = transport_factory
        self.retries = retries
        self.delay = delay
        self.n_partitions = n_partitions
        self.cookies = cookies
        self.accept_cookies = accept_cookies
        self.user_agent = user_agent
        self.agent_seed = agent_seed
        self.credentials = credentials
        self.max_content_bytes = max_content_bytes
        self.circuit_break_after = circuit_break_after

    def __call__(self, selected: DataFrame, config) -> DataFrame:
        in_schema = selected.schema
        out_schema = T.StructType(list(in_schema.fields) + list(FETCH_COLS.fields))
        in_cols = [f.name for f in in_schema.fields]

        factory = self.transport_factory
        retries = self.retries
        delay = self.delay
        redirect_limit = config.redirect_limit
        keep_redirects = config.keep_redirects
        init_cookies = self.cookies
        accept_cookies = self.accept_cookies
        user_agent = self.user_agent
        agent_seed = self.agent_seed
        credentials = self.credentials or {}
        max_content_bytes = self.max_content_bytes
        circuit_break_after = self.circuit_break_after

        def fetch_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from cloud_crawler_spark.functions.cookies import CookieStore, agent_for

            transport = factory()  # one session per partition (S6)
            jars: dict = {}        # host -> CookieStore (per-client jar analog)
            agents: dict = {}      # host -> UA (one per client, P8)
            # per-host circuit breaker: consecutive TRANSPORT failures
            # (exceptions after retries — a real 4xx/5xx is a fetched
            # page and resets). Once a host trips, its remaining rows
            # in this partition short-circuit to error rows without
            # touching the network: a dead host's 10k frontier URLs
            # cost N timeouts, not 10k x (retries+1) x read_timeout.
            # The round-level budget clamp (CrawlConfig.error_backoff)
            # then throttles the host on the NEXT round; this guards
            # the round in progress.
            fails: dict = {}       # host -> consecutive failure count
            first = True
            for pdf in pdfs:
                out_rows = []
                for row in pdf.to_dict("records"):
                    if delay and not first:
                        time.sleep(delay)
                    first = False
                    host = row.get("host") or ""
                    jar = jars.get(host)
                    if jar is None:
                        jar = jars[host] = CookieStore(init_cookies)
                    ua = agents.get(host)
                    if ua is None:
                        ua = agents[host] = (
                            agent_for(agent_seed, host)
                            if agent_seed is not None
                            else user_agent
                        )
                    if (circuit_break_after is not None
                            and fails.get(host, 0) >= circuit_break_after):
                        out_rows.append(_error_row(
                            row,
                            f"CircuitOpen: {fails[host]} consecutive "
                            f"transport failures on {host}",
                        ))
                        continue
                    rows_out = _fetch_one(
                        transport, row, retries, redirect_limit, keep_redirects,
                        jar=jar, accept_cookies=accept_cookies, user_agent=ua,
                        credentials=credentials.get(host),
                        max_content_bytes=max_content_bytes,
                    )
                    if circuit_break_after is not None:
                        if rows_out and rows_out[-1].get("error"):
                            fails[host] = fails.get(host, 0) + 1
                        else:
                            fails[host] = 0
                    out_rows.extend(rows_out)
                # dtype=object: mixed int/None (error rows' code) must
                # not collapse to float64 NaN before Arrow conversion
                yield pd.DataFrame(
                    out_rows, columns=[f.name for f in out_schema.fields], dtype=object
                )

        part_cols = ["host"] if "host" in in_cols else None
        if part_cols:
            # host partitioning = connection locality + politeness scope
            sliced = (
                selected.repartition(self.n_partitions, *part_cols)
                if self.n_partitions
                else selected.repartition(*part_cols)
            )
        else:
            sliced = selected
        return sliced.mapInPandas(fetch_partition, schema=out_schema)


def _attempt(transport, url: str, referer: Optional[str], retries: int,
             headers: Optional[dict] = None) -> FetchResponse:
    """get_response with retries (http.rb:205-216): any raise below the
    transport is retried up to `retries` times, then propagates."""
    last = None
    # http.rb:211-216: the INITIAL attempt plus `retries` retries
    # (N+1 total attempts), not N attempts
    for _ in range(1 + max(0, retries)):
        try:
            return transport(url, referer, headers)
        except Exception as e:  # noqa: BLE001 — reference rescues Exception
            last = e
    raise last


def _resp_headers(resp: FetchResponse) -> Optional[dict]:
    """The stored headers map: the transport's full capture when it
    provides one, else the 1-key reconstruction from content_type
    (page.rb:66-67 default)."""
    if resp.headers is not None:
        return resp.headers
    if resp.content_type is not None:
        return {"content-type": [resp.content_type]}
    return None


def _error_row(cur: dict, msg: str, hop: int = 0) -> dict:
    """A stored fetch-failure row (http.rb:89 semantics: error set,
    code NULL, fetched=false)."""
    return {
        **cur,
        "code": None,
        "redirect_to": None,
        "html": None,
        "fetched": False,
        "content_type": None,
        "headers": None,
        "response_time": None,
        "error": msg,
        "hop": hop,
    }


def _fetch_one(transport, row: dict, retries: int, redirect_limit: int,
               keep_redirects: bool, jar=None, accept_cookies: bool = False,
               user_agent: Optional[str] = None,
               credentials: Optional[tuple] = None,
               max_content_bytes: Optional[int] = None) -> list[dict]:
    """Fetch one frontier row, following its redirect chain (≤ limit,
    same-host or relative only). Returns the stored page rows.

    jar: the host's CookieStore — its current contents ride the Cookie
    header on every request; each response's Set-Cookie is merged back
    when accept_cookies (http.rb:196), so a cookie set on hop 0 is
    presented on hop 1 and on every later same-host fetch in this
    partition."""
    out: list[dict] = []
    url, referer, orig_host = row["url"], row.get("referer"), row.get("host")
    cur = dict(row)

    def _headers() -> Optional[dict]:
        h = {}
        if user_agent:
            h["User-Agent"] = user_agent
        cookie = jar.to_s() if jar is not None else ""
        if cookie:
            h["Cookie"] = cookie
        return h or None

    # conditional revisit GET (plans/crawler.revisit_crawl): when the
    # frontier row carries validators from the previously stored page,
    # hop 0 sends them — a 304 Not Modified then lands through the
    # normal non-redirect branch (code=304, html NULL, fetched=True),
    # telling the revisit merge to keep the stored copy
    _cond = {}
    if row.get("etag"):
        _cond["If-None-Match"] = row["etag"]
    if row.get("last_modified"):
        _cond["If-Modified-Since"] = row["last_modified"]

    for hop in range(redirect_limit + 1):
        try:
            h0 = _headers()
            if _cond and hop == 0:
                h0 = {**(h0 or {}), **_cond}
            resp = _attempt(transport, cur["url"], referer, retries, h0)
            if resp.code == 401 and credentials:
                # basic-auth retry (spec/fakeweb_helper.rb:83-89: the
                # same URL serves 401 bare, 200 with credentials)
                import base64

                h = _headers() or {}
                h["Authorization"] = "Basic " + base64.b64encode(
                    f"{credentials[0]}:{credentials[1]}".encode()
                ).decode()
                resp = _attempt(transport, cur["url"], referer, retries, h)
        except Exception as e:  # noqa: BLE001
            # fetched = !code.nil? (page.rb:78)
            out.append(_error_row(cur, f"{type(e).__name__}: {e}", hop))
            return out

        if accept_cookies and jar is not None and resp.set_cookie:
            jar.merge(resp.set_cookie)  # http.rb:196

        is_redirect = 300 <= resp.code < 400 and resp.redirect_to
        if not is_redirect:
            body, truncated = resp.body, resp.truncated
            if (max_content_bytes is not None and body is not None
                    and len(body) > max_content_bytes):
                # fetcher-level backstop for injected transports that
                # don't enforce their own cap
                body, truncated = body[:max_content_bytes], True
            headers = _resp_headers(resp)
            if truncated:
                # ISO 28500 (WARC) truncation record: reason "length"
                headers = {**(headers or {}), "warc-truncated": ["length"]}
            out.append(
                {
                    **cur,
                    "code": resp.code,
                    "redirect_to": None,
                    "html": body,
                    "fetched": True,
                    "content_type": resp.content_type,
                    "headers": headers,
                    "response_time": resp.response_time,
                    "error": None,
                    "hop": hop,
                }
            )
            return out

        # redirect hop: emit when keeping, then gate + rewrite
        next_url = to_absolute(resp.redirect_to, cur["url"], None)
        if keep_redirects or hop == redirect_limit:
            out.append(
                {
                    **cur,
                    "code": resp.code,
                    "redirect_to": resp.redirect_to,
                    "html": None,
                    "fetched": True,
                    "content_type": resp.content_type,
                    "headers": _resp_headers(resp),
                    "response_time": resp.response_time,
                    "error": None,
                    "hop": hop,
                }
            )
        if hop == redirect_limit:
            return out
        next_host = host_of(next_url) if next_url else None
        if next_url is None or next_host != orig_host:  # F7 (http.rb:245-247)
            return out
        cur = {
            **cur,
            "url": next_url,
            "canon_url": canonicalize(next_url),
            "host": next_host,
        }
    return out
