"""P7 cookie store (cookie_store_spec.rb:26-47), P8 seeded UA families
(mozilla_agents.rb:33-54), their wiring into the live-fetch stage
(http.rb:196 Set-Cookie merge), and the C6 JSON-API batch fetch
(batch_api_job.rb:48-92)."""

from __future__ import annotations

import functools
import hashlib
import json
import re

from cloud_crawler_spark.config import CrawlConfig
from cloud_crawler_spark.functions.cookies import (
    CookieStore,
    agent_for,
    parse_set_cookie,
    random_agents,
)
from cloud_crawler_spark.sources.api_fetch import ApiFetcher, DictJsonTransport
from cloud_crawler_spark.sources.http_fetch import DictTransport, HttpFetcher
from cloud_crawler_spark.sources.store import FrontierStore


class TestCookieStore:
    """Direct re-expression of spec/cookie_store_spec.rb:26-47."""

    def test_starts_empty(self):
        assert CookieStore().empty()

    def test_accepts_hash_in_constructor(self):
        assert CookieStore({"test": "cookie"})["test"].value == "cookie"

    def test_merge_http_cookie_string(self):
        cs = CookieStore({"a": "a", "b": "b"})
        cs.merge("a=A; path=/, c=C; path=/")
        assert cs["a"].value == "A"
        assert cs["b"].value == "b"
        assert cs["c"].value == "C"

    def test_to_s_header_value(self):
        assert CookieStore({"a": "a", "b": "b"}).to_s() == "a=a;b=b"

    def test_expired_cookies_filtered(self):
        """cookie_store.rb:27-29,51-53: expires in the past -> dropped
        from the header, still present in the jar."""
        cs = CookieStore({"live": "1"})
        cs.merge("old=2; Expires=Thu, 01 Jan 1970 00:00:00 GMT; path=/")
        assert "old" in cs and len(cs) == 2
        assert cs.to_s() == "live=1"

    def test_expires_comma_not_a_cookie_split(self):
        """The comma inside an Expires date must not split the cookie."""
        cookies = parse_set_cookie(
            "s=S; Expires=Wed, 21 Oct 2035 07:28:00 GMT; path=/p, t=T"
        )
        assert [(c.name, c.value) for c in cookies] == [("s", "S"), ("t", "T")]
        assert cookies[0].expires is not None and cookies[0].path == "/p"
        assert not cookies[0].expired()

    def test_malformed_chunk_skipped(self):
        assert parse_set_cookie("just garbage") == []
        assert [c.name for c in parse_set_cookie("ok=1, ;;,")] == ["ok"]


class TestAgents:
    def test_deterministic_per_seed_and_key(self):
        assert agent_for(42, "h1") == agent_for(42, "h1")
        assert agent_for(42, "h1") != agent_for(43, "h1")

    def test_all_families_reachable_and_well_formed(self):
        agents = random_agents(7, num=60)
        assert all(a.startswith("Mozilla/") for a in agents)
        # the six template families of mozilla_agents.rb:33-54
        fams = {
            "ff_mac": r"Macintosh.*Firefox/20\.0$",
            "ff_linux": r"Ubuntu/10\.10 \(maverick\) Firefox/3\.6\.",
            "chrome_win": r"Windows NT 6\.1; WOW64\) AppleWebKit.*Chrome/12\.0\.",
            "chrome_linux": r"X11; Linux x86_64\) AppleWebKit.*Chrome/13\.0\.",
            "ff_win": r"rv:5\.0\) Gecko.*Firefox/[45]\.0$",
            "msie": r"MSIE 8\.\d.*Zune 4\.\d\)$",
        }
        hit = {k for k, pat in fams.items() for a in agents if re.search(pat, a)}
        assert hit == set(fams)


HOST_A, HOST_B = "a.example.com", "b.example.com"


def _page(host: str, name: str, set_cookie: str | None = None,
          redirect_to: str | None = None) -> tuple[str, dict]:
    url = f"http://{host}/{name}"
    if redirect_to:
        spec = {"code": 301, "redirect_to": redirect_to,
                "content_type": "text/html", "response_time": 1}
    else:
        spec = {"code": 200, "body": f"<html><body>{name}</body></html>".encode(),
                "content_type": "text/html", "response_time": 1}
    if set_cookie:
        spec["set_cookie"] = set_cookie
    return url, spec


def _frontier(spark, urls: list[str]):
    rows = [(u, u, u.split("/")[2], None, 0) for u in urls]
    return spark.createDataFrame(
        rows, "url string, canon_url string, host string, referer string, depth int"
    )


def _markers(rows) -> dict[str, str]:
    """url -> the echoed '<!--UA=...;Cookie=...-->' request marker."""
    out = {}
    for r in rows:
        if r["html"]:
            m = re.search(rb"<!--(UA=.*?;Cookie=.*?)-->", r["html"])
            if m:
                out[r["url"]] = m.group(1).decode()
    return out


class TestFetchCookieWiring:
    def _run(self, spark, site, urls, **fetch_kw):
        fetcher = HttpFetcher(
            transport_factory=functools.partial(DictTransport, site, 0, True),
            **fetch_kw,
        )
        return fetcher(_frontier(spark, urls), CrawlConfig()).collect()

    def test_initial_cookies_ride_every_request(self, spark):
        site = dict([_page(HOST_A, "0")])
        rows = self._run(spark, site, [f"http://{HOST_A}/0"],
                         cookies={"a": "a", "b": "b"})
        assert _markers(rows)[f"http://{HOST_A}/0"].endswith("Cookie=a=a;b=b")

    def test_accept_cookies_merges_across_redirect_hops(self, spark):
        """The 301 hop sets s=S; the landing fetch presents it merged
        with the initial jar (http.rb:196)."""
        landing = f"http://{HOST_A}/1"
        site = dict([
            _page(HOST_A, "r", set_cookie="s=S; path=/", redirect_to=landing),
            _page(HOST_A, "1"),
        ])
        rows = self._run(spark, site, [f"http://{HOST_A}/r"],
                         cookies={"a": "a"}, accept_cookies=True)
        assert _markers(rows)[landing].endswith("Cookie=a=a;s=S")

    def test_accept_cookies_false_ignores_set_cookie(self, spark):
        landing = f"http://{HOST_A}/1"
        site = dict([
            _page(HOST_A, "r", set_cookie="s=S; path=/", redirect_to=landing),
            _page(HOST_A, "1"),
        ])
        rows = self._run(spark, site, [f"http://{HOST_A}/r"],
                         cookies={"a": "a"}, accept_cookies=False)
        assert _markers(rows)[landing].endswith("Cookie=a=a")

    def test_jar_is_per_host(self, spark):
        """Host A's Set-Cookie never leaks onto host B's requests —
        the jar is scoped like the reference's per-client store."""
        land_a, land_b = f"http://{HOST_A}/1", f"http://{HOST_B}/1"
        site = dict([
            _page(HOST_A, "r", set_cookie="ca=A; path=/", redirect_to=land_a),
            _page(HOST_A, "1"),
            _page(HOST_B, "r", set_cookie="cb=B; path=/", redirect_to=land_b),
            _page(HOST_B, "1"),
        ])
        rows = self._run(spark, site,
                         [f"http://{HOST_A}/r", f"http://{HOST_B}/r"],
                         accept_cookies=True)
        marks = _markers(rows)
        assert marks[land_a].endswith("Cookie=ca=A")
        assert marks[land_b].endswith("Cookie=cb=B")

    def test_agent_seed_gives_deterministic_per_host_ua(self, spark):
        site = dict([_page(HOST_A, "0"), _page(HOST_B, "0")])
        rows = self._run(spark, site,
                         [f"http://{HOST_A}/0", f"http://{HOST_B}/0"],
                         agent_seed=42)
        marks = _markers(rows)
        assert marks[f"http://{HOST_A}/0"].startswith(f"UA={agent_for(42, HOST_A)};")
        assert marks[f"http://{HOST_B}/0"].startswith(f"UA={agent_for(42, HOST_B)};")

    def test_fixed_user_agent(self, spark):
        site = dict([_page(HOST_A, "0")])
        rows = self._run(spark, site, [f"http://{HOST_A}/0"],
                         user_agent="crawler/1.0")
        assert _markers(rows)[f"http://{HOST_A}/0"].startswith("UA=crawler/1.0;")


class TestApiFetcher:
    SITE = {
        f"http://{HOST_A}/api/1": {"b": 2, "a": 1},
        f"http://{HOST_A}/api/bad": "{not json",
    }

    def _urls(self, spark, names):
        return spark.createDataFrame(
            [(f"http://{HOST_A}/api/{n}", HOST_A) for n in names],
            "url string, host string",
        )

    def test_json_parsed_canonical_and_hashed(self, spark):
        f = ApiFetcher(functools.partial(DictJsonTransport, self.SITE))
        rows = {r["url"]: r for r in f(self._urls(spark, ["1"])).collect()}
        r = rows[f"http://{HOST_A}/api/1"]
        assert r["code"] == 200 and r["error"] is None
        assert r["doc_json"] == '{"a":1,"b":2}'  # sorted-key canonical form
        assert r["doc_id"] == hashlib.sha1(b'{"a":1,"b":2}').hexdigest()

    def test_error_rows_for_bad_json_and_404(self, spark):
        f = ApiFetcher(functools.partial(DictJsonTransport, self.SITE))
        rows = {r["url"]: r for r in f(self._urls(spark, ["bad", "gone"])).collect()}
        bad = rows[f"http://{HOST_A}/api/bad"]
        assert bad["doc_json"] is None and bad["error"].startswith("json:")
        gone = rows[f"http://{HOST_A}/api/gone"]
        assert gone["code"] == 404 and gone["error"] == "http 404"

    def test_auth_headers_ride_every_request(self, spark):
        """do_pre_batch_with_auth (batch_api_job.rb:71-77): the
        per-partition auth hook's headers reach the transport."""
        f = ApiFetcher(
            functools.partial(DictJsonTransport, self.SITE, True),
            auth_factory=lambda: {"Authorization": "Bearer tok"},
        )
        r = f(self._urls(spark, ["1"])).collect()[0]
        assert json.loads(r["doc_json"])["_headers"]["Authorization"] == "Bearer tok"

    def test_store_docs_unless_discard(self, spark, tmp_path):
        """do_post_batch_with_docstore (batch_api_job.rb:79-92)."""
        f = ApiFetcher(functools.partial(DictJsonTransport, self.SITE))
        fetched = f(self._urls(spark, ["1", "bad"]))
        store = FrontierStore(spark, str(tmp_path / "st"))
        f.store_docs(store, 0, fetched)
        docs = store.docs(upto=0).collect()
        assert len(docs) == 1  # the bad-JSON row is not committed
        assert json.loads(docs[0]["doc_json"])["url"] == f"http://{HOST_A}/api/1"

        discard = ApiFetcher(functools.partial(DictJsonTransport, self.SITE),
                             discard_doc=True)
        store2 = FrontierStore(spark, str(tmp_path / "st2"))
        discard.store_docs(store2, 0, fetched)
        assert store2.docs(upto=0).count() == 0
