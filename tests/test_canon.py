"""URL canonicalization goldens — re-expression of the reference specs:
spec/redis_url_bloomfilter_spec.rb:42-44,85-88 (https->http + lowercase),
spec/page_spec.rb:149-202 (to_absolute matrix), driver.rb:115-119
(empty path -> '/'). Pure Python — no Spark session needed."""

from cloud_crawler_spark.functions.canon import (
    canonicalize,
    host_of,
    path_of,
    to_absolute,
)


class TestCanonicalize:
    def test_https_to_http_and_lowercase(self):
        # spec/redis_url_bloomfilter_spec.rb:42-44
        assert canonicalize("https://www.google.com") == "http://www.google.com/"
        assert canonicalize("https://WWW.Google.COM/") == "http://www.google.com/"

    def test_cross_scheme_identity(self):
        # visit https, look up http -> same key (spec :85-88)
        assert canonicalize("https://www.example.com/a") == canonicalize(
            "http://www.example.com/a"
        )

    def test_whitespace_squash(self):
        # key_for gsub(/\s+/, ' ')
        assert canonicalize("http://x.com/a  b\tc") == canonicalize("http://x.com/a b c")

    def test_empty_path_becomes_slash(self):
        # driver.rb:115-119 normalize_link
        assert canonicalize("http://www.example.com") == "http://www.example.com/"

    def test_fragment_stripped(self):
        assert canonicalize("http://x.com/p#frag") == "http://x.com/p"
        assert canonicalize("http://x.com/#top") == "http://x.com/"

    def test_default_port_stripped(self):
        assert canonicalize("http://x.com:80/p") == "http://x.com/p"
        assert canonicalize("https://x.com:443/p") == "http://x.com/p"
        assert canonicalize("http://x.com:8080/p") == "http://x.com:8080/p"

    def test_query_params_sorted(self):
        assert canonicalize("http://x.com/p?b=2&a=1") == "http://x.com/p?a=1&b=2"

    def test_query_string_identity_preserved(self):
        # spec/crawl_job_spec.rb:133-142: '1?foo=1' != '1'
        assert canonicalize("http://x.com/1?foo=1") != canonicalize("http://x.com/1")

    def test_none_and_empty(self):
        assert canonicalize(None) is None
        assert canonicalize("   ") is None


class TestToAbsolute:
    URL = "http://www.example.com/dir/page.html"

    def test_identity_absolute(self):
        # spec/page_spec.rb:164-170
        assert to_absolute("http://other.com/x", self.URL) == "http://other.com/x"

    def test_relative(self):
        assert to_absolute("other.html", self.URL) == "http://www.example.com/dir/other.html"

    def test_root_relative(self):
        assert to_absolute("/root.html", self.URL) == "http://www.example.com/root.html"

    def test_dotdot(self):
        assert to_absolute("../up.html", self.URL) == "http://www.example.com/up.html"

    def test_anchor_resolves_to_page(self):
        # spec/page_spec.rb:149-155: '#top' -> the page URL, not %23
        assert to_absolute("#top", self.URL) == self.URL

    def test_base_href_wins(self):
        # spec/page_spec.rb:186-202 + page.rb:217-225
        assert (
            to_absolute("x.html", self.URL, "http://base.example.com/bdir/")
            == "http://base.example.com/bdir/x.html"
        )

    def test_empty_path_gets_slash(self):
        assert to_absolute("http://www.example.com", self.URL) == "http://www.example.com/"

    def test_non_http_scheme_rejected(self):
        assert to_absolute("mailto:x@y.com", self.URL) is None
        assert to_absolute("javascript:void(0)", self.URL) is None


def test_host_and_path_helpers():
    assert host_of("http://WWW.Example.com/p") == "www.example.com"
    assert path_of("http://x.com/a/b?q=1") == "/a/b?q=1"
    assert path_of("http://x.com") == "/"


# ---------------------------------------------------------------- fast paths


class TestFastPathEquivalence:
    """The hot-path regex shortcuts in canonicalize/to_absolute must be
    byte-identical to the general pipeline for EVERY input — property-
    tested over an alphabet that straddles the fast-path boundary."""

    def test_canonicalize_fast_equals_slow(self):
        from hypothesis import given, settings, strategies as st

        from cloud_crawler_spark.functions.canon import _canonicalize_slow

        alphabet = "abzAZ09._~!$&'()*+,;=:@/-%?# \t"

        @settings(max_examples=500, deadline=None)
        @given(
            st.text(alphabet=alphabet, max_size=24).map(
                lambda s: f"http://h{s and 'o'}st.com/{s}"
            )
        )
        def check(u):
            assert canonicalize(u) == _canonicalize_slow(u)

        check()

    def test_to_absolute_fast_equals_slow(self):
        from hypothesis import given, settings, strategies as st

        from cloud_crawler_spark.functions.canon import _to_absolute_slow

        alphabet = "abzAZ09._~!$&'()*+,;=:@/-%?# \t"
        page = "http://www.example.com/dir/page"

        @settings(max_examples=500, deadline=None)
        @given(st.text(alphabet=alphabet, max_size=24))
        def check(s):
            for href in (f"http://x.com/{s}", f"https://X9.com/{s}", s):
                assert to_absolute(href, page) == _to_absolute_slow(href, page)

        check()

    def test_resolve_parts_equals_composition(self):
        from hypothesis import given, settings, strategies as st

        from cloud_crawler_spark.functions.canon import resolve_parts

        page = "http://www.example.com/dir/page"

        @settings(max_examples=500, deadline=None)
        @given(st.text(alphabet="abzAZ09._~!$&'()*+,;=:@/-%?# \t", max_size=24))
        def check(s):
            for href in (f"http://x.com/{s}", f"/rel/{s}", s):
                a, c, h, p = resolve_parts(href, page)
                a2 = to_absolute(href, page)
                c2 = canonicalize(a2) if a2 else None
                assert a == a2 and c == c2
                assert h == (host_of(c2) if c2 else None)
                assert p == (path_of(c2) if c2 else None)

        check()

    def test_fast_path_hits_common_shapes(self):
        """The shapes a web corpus is made of must actually take the
        fast path (guard against regex rot silently degrading perf)."""
        from cloud_crawler_spark.functions.canon import (
            _FAST_ABS_RE,
            _FAST_CANON_RE,
            _FAST_RESOLVED_RE,
        )

        for u in ("http://host0.example.com/p123",
                  "http://a.b.c/x/y/z.html",
                  "http://x.com/"):
            assert _FAST_CANON_RE.match(u) and _FAST_ABS_RE.match(u)
            assert _FAST_RESOLVED_RE.match(u)
        for u in ("https://x.com/p", "http://X.com/p", "http://x.com/p?q=1",
                  "http://x.com/p#f", "http://x.com", "http://x.com/a b",
                  "http://x.com:8080/p", "http://x.com/%7Euser"):
            assert not _FAST_CANON_RE.match(u)
            assert not _FAST_RESOLVED_RE.match(u)
        # ';' is canonical-safe but NOT resolve-safe (urljoin drops an
        # empty trailing params segment)
        assert _FAST_CANON_RE.match("http://x.com/a;b")
        assert not _FAST_RESOLVED_RE.match("http://x.com/a;b")


class TestStripTrackingParams:
    def test_semantics(self):
        from cloud_crawler_spark.functions.canon import strip_tracking_params as s

        assert s(None) is None
        assert s("http://h.com/p") == "http://h.com/p"
        # tracking params drop; other params keep their sorted order
        assert s("http://h.com/p?a=1&utm_source=x&z=2") == "http://h.com/p?a=1&z=2"
        # an emptied query loses its '?'
        assert s("http://h.com/p?fbclid=f&gclid=g") == "http://h.com/p"
        # bare (valueless) tracking params drop too
        assert s("http://h.com/p?page=2&utm_campaign") == "http://h.com/p?page=2"
        # whole-name match only: lookalikes survive
        assert s("http://h.com/p?utmx=1&refid=2") == "http://h.com/p?utmx=1&refid=2"
        # raw (pre-canonicalize) URLs carry mixed-case tracking params
        assert s("http://h.com/p?UTM_SOURCE=Ad1&x=1") == "http://h.com/p?x=1"
        assert s("http://h.com/p?GCLID") == "http://h.com/p"


class TestSurtKey:
    """functions/canon.surt_key — SURT web-archive keys (pure codegen)."""

    def _surt(self, spark, urls):
        from cloud_crawler_spark.functions.canon import surt_key
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [r[0] for r in df.select(surt_key(F.col("url"))).collect()]

    def test_semantics(self, spark):
        got = self._surt(spark, [
            "http://example.com/p1",
            "http://www.example.com/",
            "http://example.com",                      # no path -> '/'
            "http://s1.blog.example.org:8080/a/b",     # port kept
            "http://example.com/p?b=2&a=1",            # query sorted
            "http://example.com/p?z=1",
            "http://localhost/x",                      # single-label host
        ])
        assert got == [
            "com,example)/p1",
            "com,example,www)/",
            "com,example)/",
            "org,example,blog,s1:8080)/a/b",
            "com,example)/p?a=1&b=2",
            "com,example)/p?z=1",
            "localhost)/x",
        ]

    def test_domain_prefix_clusters_subdomains(self, spark):
        """All subdomains of example.com share the 'com,example' key
        prefix — the property that makes SURT-sorted tables range-scan
        per-domain work."""
        got = self._surt(spark, [
            "http://example.com/a",
            "http://www.example.com/b",
            "http://api.v2.example.com/c",
            "http://examplezcom.net/d",
        ])
        assert [g.startswith("com,example") for g in got] == [
            True, True, True, False]

    def test_codegen_no_udf_no_shuffle(self, spark):
        from cloud_crawler_spark.functions.canon import surt_key
        from pyspark.sql import functions as F

        df = spark.range(10).select(
            F.concat(F.lit("http://h"), F.col("id").cast("string"),
                     F.lit(".com/p")).alias("url"))
        plan = df.select(surt_key(F.col("url")))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestCanonicalAliases:
    """rel=canonical extraction + alias resolution
    (functions/canon.canonical_aliases)."""

    def _run(self, spark, url, html):
        from cloud_crawler_spark.functions.canon import canonical_aliases
        df = spark.createDataFrame([(url, html)], "url string, html string")
        return canonical_aliases(df).collect()[0]

    def test_double_quoted(self, spark):
        r = self._run(spark, "http://a.com/x?b=2&a=1",
                      '<link rel="canonical" href="http://a.com/y">')
        assert r.canonical_target == "http://a.com/y" and r.is_alias == 1
        assert r.canon_url == "http://a.com/x?a=1&b=2"  # canonicalized

    def test_href_before_rel_and_single_quotes(self, spark):
        r = self._run(spark, "http://a.com/x",
                      "<link href='http://a.com/y' rel='canonical'>")
        assert r.canonical_target == "http://a.com/y" and r.is_alias == 1

    def test_unquoted_and_case_insensitive(self, spark):
        r = self._run(spark, "http://a.com/x",
                      "<LINK REL=CANONICAL HREF=http://a.com/y>")
        assert r.canonical_target == "http://a.com/y"

    def test_relative_href_resolved_against_page(self, spark):
        r = self._run(spark, "http://a.com/dir/x",
                      '<link rel="canonical" href="../y">')
        assert r.canonical_target == "http://a.com/y" and r.is_alias == 1

    def test_target_is_canonicalized(self, spark):
        r = self._run(spark, "http://a.com/x",
                      '<link rel="canonical" href="HTTPS://A.com:443/Y?b=2&a=1#f">')
        assert r.canonical_target == "http://a.com/y?a=1&b=2"

    def test_missing_declaration_self_loops(self, spark):
        r = self._run(spark, "http://a.com/x", "<html><body>x</body></html>")
        assert r.canonical_target == "http://a.com/x" and r.is_alias == 0

    def test_self_canonical_not_alias(self, spark):
        r = self._run(spark, "http://a.com/x",
                      '<link rel="canonical" href="http://a.com/x">')
        assert r.is_alias == 0

    def test_no_shuffle_plan(self, spark):
        from cloud_crawler_spark.functions.canon import canonical_aliases
        from pyspark.sql import functions as F
        df = spark.range(20).select(
            F.concat(F.lit("http://a.com/p"), F.col("id")).alias("url"),
            F.lit('<link rel="canonical" href="http://a.com/hub">')
            .alias("html"),
        )
        plan = canonical_aliases(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestDustRules:
    def _aliases(self, spark, rows):
        return spark.createDataFrame(rows, "url string, content_hash string")

    def test_classifies_each_rule(self, spark):
        from cloud_crawler_spark.functions.canon import dust_rules

        got = {
            r["rule"]: (r["n_pairs"], r["n_hosts"])
            for r in dust_rules(self._aliases(spark, [
                ("http://a.com/x/", "h1"),
                ("http://a.com/x/index.html", "h1"),
                ("http://b.com/y", "h2"),
                ("http://b.com/y/", "h2"),
                ("http://c.com/z", "h3"),
                ("https://c.com/z", "h3"),
                ("http://d.com/w", "h4"),
                ("http://www.d.com/w", "h4"),
                ("http://e.com/v", "h5"),
                ("http://e.com/v?ref=rss", "h5"),
            ])).collect()
        }
        assert got == {
            "strip_index_file": (1, 1),
            "strip_slash": (1, 1),
            "https_to_http": (1, 1),
            "strip_www": (1, 1),
            "other": (1, 1),
        }

    def test_mega_alias_hash_gated(self, spark):
        from cloud_crawler_spark.functions.canon import dust_rules

        # one hash shared by 60 urls (soft-404 template) must be
        # excluded by max_aliases_per_hash, not fan out 1770 pairs
        rows = [(f"http://t.com/{i}", "tmpl") for i in range(60)]
        rows += [("http://a.com/x", "h1"), ("http://a.com/x/", "h1")]
        out = dust_rules(self._aliases(spark, rows),
                         max_aliases_per_hash=50).collect()
        assert {r["rule"] for r in out} == {"strip_slash"}

    def test_singleton_hash_no_pair(self, spark):
        from cloud_crawler_spark.functions.canon import dust_rules

        out = dust_rules(
            self._aliases(spark, [("http://a.com/only", "h1")])
        ).collect()
        assert out == []


# --------------------------------------------- registrable domain (PSL)


def test_registrable_domain_psl_cases(spark):
    """publicsuffix.org algorithm over the snapshot rules: longest
    match, private-section multi-label suffixes, implicit * for
    unknown TLDs, NULL when the host IS a public suffix, and
    case-insensitive matching."""
    from cloud_crawler_spark.functions.canon import with_registrable_domain

    cases = {
        "example.com": ("com", "example.com"),
        "www.example.co.uk": ("co.uk", "example.co.uk"),
        "a.b.site1.github.io": ("github.io", "site1.github.io"),
        "deep.sub.h2.example.org": ("org", "example.org"),
        "h1.ac.jp": ("ac.jp", "h1.ac.jp"),
        "host.unknowntld": ("unknowntld", "host.unknowntld"),
        "co.uk": ("co.uk", None),
        "bucket.s3.amazonaws.com": ("s3.amazonaws.com",
                                    "bucket.s3.amazonaws.com"),
        "UNKNOWNTLD": ("unknowntld", None),
        "WWW.Example.COM": ("com", "example.com"),
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: (r["public_suffix"], r["registrable_domain"])
        for r in with_registrable_domain(df).collect()
    }
    assert got == cases


def test_registrable_domain_custom_rules(spark):
    from cloud_crawler_spark.functions.canon import (
        psl_rules,
        with_registrable_domain,
    )

    rules = psl_rules(spark, ["test", "x.test"])
    df = spark.createDataFrame(
        [("a.x.test",), ("b.test",)], "host string")
    got = {
        r["host"]: r["registrable_domain"]
        for r in with_registrable_domain(df, rules=rules).collect()
    }
    assert got == {"a.x.test": "a.x.test", "b.test": "b.test"}


class TestUrlEquivalence:
    def test_mixed_signals_transitive_collapse(self, spark):
        from cloud_crawler_spark.functions.canon import url_equivalence

        # m-dot page --canonical--> www page --redirect--> final page;
        # an unrelated pair; and one isolated url from the universe
        edges = spark.createDataFrame(
            [("http://m.ex.com/a", "http://www.ex.com/a"),
             ("http://www.ex.com/a", "http://ex.com/a"),
             ("http://ex.com/x", "http://ex.com/y")],
            "src_url string, dst_url string")
        urls = spark.createDataFrame(
            [("http://m.ex.com/a",), ("http://www.ex.com/a",),
             ("http://ex.com/a",), ("http://ex.com/x",),
             ("http://ex.com/y",), ("http://ex.com/island",)],
            "url string")
        got = {r.url: (r.rep_url, r.is_rep)
               for r in url_equivalence(edges, urls=urls).collect()}
        assert got["http://m.ex.com/a"] == ("http://ex.com/a", 0)
        assert got["http://www.ex.com/a"] == ("http://ex.com/a", 0)
        assert got["http://ex.com/a"] == ("http://ex.com/a", 1)
        assert got["http://ex.com/x"] == ("http://ex.com/x", 1)
        assert got["http://ex.com/y"] == ("http://ex.com/x", 0)
        assert got["http://ex.com/island"] == ("http://ex.com/island", 1)
        # exactly one representative per class
        reps = [v for v, is_rep in got.values() if is_rep]
        assert sorted(set(v for v, _ in got.values())) == sorted(reps)

    def test_composes_with_canonical_aliases(self, spark):
        from cloud_crawler_spark.functions.canon import (
            canonical_aliases, url_equivalence,
        )

        pages = spark.createDataFrame(
            [("http://www.ex.com/print/1",
              '<html><head><link rel="canonical" '
              'href="http://www.ex.com/1"/></head></html>'),
             ("http://www.ex.com/1", "<html>real</html>")],
            "url string, html string")
        from pyspark.sql import functions as F

        al = canonical_aliases(pages).where(F.col("is_alias") == 1).select(
            F.col("canon_url").alias("src_url"),
            F.col("canonical_target").alias("dst_url"))
        got = {r.url: r.rep_url for r in url_equivalence(al).collect()}
        assert len(got) == 2
        assert len(set(got.values())) == 1  # one class
