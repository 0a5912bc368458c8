"""WARC source/sink: write_warc -> read_warc round trip is
byte-faithful, and a crawl over a WARC-loaded corpus equals the same
crawl over the parquet-shaped corpus."""

import gzip
import glob
import hashlib
import io

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.sources.warc import (
    _iter_warc_records, fetch_records, read_cdx, read_warc, record_at,
    warc_to_pages, write_warc)
from tests.helpers import crawled_names, make_corpus, make_seeds

_U = "http://www.example.com"


def _pages(spark, n=37):
    return spark.range(n).select(
        F.concat(F.lit(f"{_U}/p"), F.col("id")).alias("url"),
        F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>doc "), F.col("id"),
                          F.lit(" é</body></html>")), "utf-8").alias("html"),
    )


class TestWarcRoundTrip:
    def test_round_trip(self, spark, tmp_path):
        out = str(tmp_path / "warc")
        pages = _pages(spark).repartition(3)
        manifest = write_warc(pages, out)
        mrows = manifest.collect()
        assert sum(r["n_records"] for r in mrows) == 37
        assert len(glob.glob(out + "/*.warc.gz")) == len(mrows)

        back = read_warc(spark, out)
        rows = {r["url"]: r for r in back.collect()}
        orig = {r["url"]: r for r in pages.collect()}
        assert set(rows) == set(orig)
        for url, r in rows.items():
            assert bytes(r["html"]) == bytes(orig[url]["html"])  # byte-faithful
            assert r["http_status"] == 200
            assert r["content_type"] == "text/html"
            assert r["warc_type"] == "response"
            assert r["warc_ts"] is not None

    def test_member_per_record_gzip(self, spark, tmp_path):
        """Common Crawl layout: every record its own gzip member, so a
        CDX offset can random-access one record."""
        out = str(tmp_path / "warc")
        write_warc(_pages(spark, 5).coalesce(1), out)
        (fname,) = glob.glob(out + "/*.warc.gz")
        raw = open(fname, "rb").read()
        # 5 members -> 5 gzip magics at member starts
        assert raw.count(b"\x1f\x8b\x08") >= 5
        # each member alone is a complete record
        first = gzip.GzipFile(fileobj=io.BytesIO(raw))
        recs = list(_iter_warc_records(first))
        assert len(recs) == 5
        assert all(r["headers"]["warc-type"] == "response" for r in recs)

    def test_non_response_records_skipped(self, spark, tmp_path):
        out = tmp_path / "mixed"
        out.mkdir()
        body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>x</html>"
        info = b"software: test\r\n"
        rec = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Length: " + str(len(info)).encode() + b"\r\n\r\n"
            + info + b"\r\n\r\n"
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://a.example/x\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )
        (out / "f.warc").write_bytes(rec)
        rows = read_warc(spark, str(out)).collect()
        assert len(rows) == 1
        assert rows[0]["url"] == "http://a.example/x"
        assert bytes(rows[0]["html"]) == b"<html>x</html>"


class TestCdx:
    def test_read_cdx_matches_manifest_and_digests(self, spark, tmp_path):
        out = str(tmp_path / "warc")
        pages = _pages(spark).repartition(3)
        manifest = {r["warc_file"]: r["n_records"]
                    for r in write_warc(pages, out).collect()}
        assert len(glob.glob(out + "/*.cdx")) == len(manifest)

        cdx = read_cdx(spark, out)
        per_file = {r["warc_file"]: r["n"]
                    for r in cdx.groupBy("warc_file")
                               .agg(F.count("*").alias("n")).collect()}
        assert per_file == manifest

        html = {r["url"]: bytes(r["html"]) for r in pages.collect()}
        for r in cdx.collect():
            assert r["digest"] == hashlib.sha1(html[r["url"]]).hexdigest()
            assert r["warc_ts"] is not None

    def test_record_at_slices_exact_record(self, spark, tmp_path):
        out = str(tmp_path / "warc")
        write_warc(_pages(spark, 9).coalesce(1), out)
        rows = read_cdx(spark, out).collect()
        assert len(rows) == 9
        for r in rows:
            rec = record_at(f"{out}/{r['warc_file']}", r["offset"], r["length"])
            assert rec["url"] == r["url"]
            assert hashlib.sha1(rec["html"]).hexdigest() == r["digest"]
            assert rec["http_status"] == 200

    def test_fetch_records_subset(self, spark, tmp_path):
        out = str(tmp_path / "warc")
        pages = _pages(spark, 23).repartition(4)
        write_warc(pages, out)
        wanted = read_cdx(spark, out).where(
            F.regexp_extract("url", r"p(\d+)$", 1).cast("int") % 3 == 0)
        want_urls = {r["url"] for r in wanted.select("url").collect()}
        assert 0 < len(want_urls) < 23

        got = {r["url"]: r for r in fetch_records(wanted, out).collect()}
        assert set(got) == want_urls
        orig = {r["url"]: bytes(r["html"]) for r in pages.collect()}
        for url in want_urls:
            assert bytes(got[url]["html"]) == orig[url]  # byte-identical
            assert got[url]["warc_type"] == "response"


class TestWarcCrawl:
    def test_crawl_over_warc_corpus(self, spark, tmp_path):
        from cloud_crawler_spark import CrawlConfig, crawl
        from cloud_crawler_spark.sources.corpus import prepare_corpus

        graph = {
            "0": {"links": ["1", "2"]},
            "1": {"links": ["3"]},
            "2": {},
            "3": {},
            "9": {},  # unreachable
        }
        parquet_corpus = make_corpus(spark, graph)
        seeds = make_seeds(spark, [f"{_U}/0"])
        ref = crawl(spark, parquet_corpus, seeds, CrawlConfig())

        # export the same pages as WARC, reload, re-crawl
        out = str(tmp_path / "export")
        write_warc(parquet_corpus.pages.select("url", "warc_ts", "html"), out)
        pages2 = warc_to_pages(read_warc(spark, out))
        # text/lang are null after WARC load — the crawl extracts text
        corpus2 = prepare_corpus(pages2)
        res = crawl(spark, corpus2, seeds, CrawlConfig())
        assert crawled_names(res) == crawled_names(ref) == {"0", "1", "2", "3"}
        a = {r["canon_url"]: r["text"] for r in ref.crawled.collect()}
        b = {r["canon_url"]: r["text"] for r in res.crawled.collect()}
        assert a == b


class TestWet:
    def _text_pages(self, spark, n=23):
        return spark.range(n).select(
            F.concat(F.lit(f"{_U}/t"), F.col("id")).alias("url"),
            F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("warc_ts"),
            F.concat(F.lit("extracted text "), F.col("id"),
                     F.lit(" with unicode é")).alias("text"),
        )

    def test_wet_round_trip(self, spark, tmp_path):
        from cloud_crawler_spark.sources.warc import read_wet, write_wet

        out = str(tmp_path / "wet")
        pages = self._text_pages(spark).repartition(3)
        manifest = write_wet(pages, out)
        assert sum(r["n_records"] for r in manifest.collect()) == 23
        assert glob.glob(out + "/*.warc.wet.gz")

        back = {r["url"]: r for r in read_wet(spark, out).collect()}
        orig = {r["url"]: r for r in pages.collect()}
        assert set(back) == set(orig)
        for url, r in back.items():
            assert r["text"] == orig[url]["text"]
            assert r["warc_ts"] is not None

    def test_wet_refers_to_matches_warc_record_id(self, spark, tmp_path):
        """The WET record's WARC-Refers-To is the uuid5 id write_warc
        assigns the same URL's response record (CC pair semantics)."""
        import uuid as _uuid

        from cloud_crawler_spark.sources.warc import write_wet

        out = str(tmp_path / "wet2")
        write_wet(self._text_pages(spark, 3).coalesce(1), out)
        fname = glob.glob(out + "/*.warc.wet.gz")[0]
        with gzip.open(fname, "rb") as f:
            recs = list(_iter_warc_records(f))
        assert len(recs) == 3
        for rec in recs:
            h = rec["headers"]
            assert h["warc-type"] == "conversion"
            assert h["content-type"] == "text/plain"
            url = h["warc-target-uri"]
            want = str(_uuid.uuid5(_uuid.NAMESPACE_URL, url))
            assert h["warc-refers-to"] == f"<urn:uuid:{want}>"

    def test_read_warc_ignores_wet_files(self, spark, tmp_path):
        """A mixed segment directory: read_warc must not surface
        conversion records even though *.warc* matches the wet files."""
        from cloud_crawler_spark.sources.warc import read_wet, write_wet

        out = str(tmp_path / "mixed")
        html = _pages(spark, 5).coalesce(1)
        write_warc(html, out)
        write_wet(self._text_pages(spark, 7).coalesce(1), out)
        assert read_warc(spark, out).count() == 5
        assert read_wet(spark, out).count() == 7


class TestNullTimestamp:
    def test_null_warc_ts_writes_epoch_instead_of_crashing(self, spark, tmp_path):
        from cloud_crawler_spark.sources.warc import write_wet

        pages = spark.createDataFrame(
            [(f"{_U}/a", None, b"<html>a</html>")],
            "url string, warc_ts timestamp, html binary",
        )
        out = str(tmp_path / "nullts")
        assert write_warc(pages, out).collect()[0]["n_records"] == 1
        rec = read_warc(spark, out).first()
        assert rec["warc_ts"].year == 1970  # NaT -> epoch, not a crash

        wet = pages.selectExpr("url", "warc_ts", "'t' AS text")
        assert write_wet(wet, str(tmp_path / "nullwet")).collect()[0]["n_records"] == 1
