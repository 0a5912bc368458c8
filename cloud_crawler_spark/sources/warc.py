"""WARC (ISO 28500) source/sink — the Common Crawl wire format.

At 100 TB the corpus doesn't arrive as parquet: it arrives as tens of
thousands of ~1 GB ``.warc.gz`` segment files, one gzip member per
record (the Common Crawl convention, which is what makes per-record
random access via CDX offsets possible). This module maps that shape
onto Spark's execution model:

- ``read_warc``: ``spark.read.format("binaryFile")`` gives ONE task per
  WARC file — exactly the parallelism grain the format supports (a
  member-gzip stream cannot be split mid-file without an index), and at
  Common Crawl scale the file count (~64k/crawl) dwarfs any cluster's
  core count, so per-file tasks saturate it. Records are parsed
  streaming (``gzip.GzipFile`` over the file bytes), yielded in bounded
  pandas batches via ``mapInPandas`` — peak memory per task is one
  decompressed record + one output batch, never the whole file.
- ``write_warc``: a ``mapInPandas`` sink writing one ``.warc.gz`` per
  input partition (member-per-record), returning a 1-row-per-file
  manifest — the distributed inverse used by tests and by re-export
  pipelines.
- ``warc_to_pages``: adapts parsed records to the engine's corpus
  ``pages`` schema (sources/corpus.py PAGES_SCHEMA) so a WARC crawl is
  ``crawl(spark, prepare_corpus(warc_to_pages(read_warc(...))), ...)``.
- CDX index (the Common Crawl random-access contract): ``write_warc``
  emits one ``part-<n>.cdx`` beside each warc part — one tab-separated
  line per record carrying ``(url, ts, member offset, member length,
  sha1(body), warc_file)``. ``read_cdx`` loads the index as a
  DataFrame; ``record_at`` slice-reads ONE record from a warc file by
  (offset, length) without touching the rest (each record is its own
  gzip member); ``fetch_records`` is the distributed version — shuffle
  the wanted index rows by warc_file, then one pass of offset-ordered
  seeks per file. On object storage the same access pattern maps to
  ranged GETs, which is exactly how Common Crawl serves record lookups.

Only ``WARC-Type: response`` records carry pages; request/metadata/
warcinfo records are skipped. The HTTP payload is split at the first
CRLFCRLF into response headers (status + Content-Type extracted) and
the raw body bytes. No external libs — stdlib gzip + email-free manual
header parsing, deterministic and byte-faithful.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("warc_file", T.StringType()),
    ]
)

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    """Parse a CRLF header block (WARC or HTTP) into a lowercase-keyed
    dict; continuation lines (obs-fold) are appended with a space."""
    out: dict[str, str] = {}
    last = None
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            out[last] += " " + line.strip().decode("latin-1")
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            continue
        last = k.strip().decode("latin-1").lower()
        out[last] = v.strip().decode("latin-1")
    return out


def _iter_warc_records(stream: io.BufferedIOBase) -> Iterator[dict]:
    """Stream WARC records from a (decompressed) byte stream: version
    line, CRLF headers, Content-Length payload, CRLFCRLF trailer."""
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        while line in (_CRLF, b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {line[:40]!r}")
        header_lines = []
        while True:
            hl = stream.readline()
            if hl in (_CRLF, b"\n", b""):
                break
            header_lines.append(hl)
        headers = _parse_headers(b"".join(header_lines))
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield {"headers": headers, "payload": payload}


def _split_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response payload -> (status, content_type, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4:]
    status_line, _, rest = head.partition(_CRLF)
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = _parse_headers(rest).get("content-type")
    return status, ctype, body


def _response_row(rec: dict, warc_file: str) -> dict | None:
    """WARC record dict -> a WARC_RECORD_SCHEMA row (None for
    non-response records)."""
    h = rec["headers"]
    if h.get("warc-type") != "response":
        return None
    status, ctype, body = _split_http_payload(rec["payload"])
    return {
        "url": h.get("warc-target-uri"),
        "warc_ts": pd.Timestamp(h.get("warc-date")),
        "warc_type": h.get("warc-type"),
        "http_status": status,
        "content_type": ctype,
        "html": body,
        "warc_file": warc_file,
    }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` files under `path` into the
    WARC_RECORD_SCHEMA DataFrame (response records only). One task per
    file; records stream out in bounded batches."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(fpath)
                # '*.warc*' also globs the '.warc.wet.gz' companions a
                # write_wet into the same directory produces; skip them
                # by name instead of gunzipping whole files only to drop
                # every (non-response) record
                if ".wet." in base or base.endswith(".wet"):
                    continue
                raw = bytes(content)
                if fpath.endswith(".gz"):
                    stream: io.BufferedIOBase = gzip.GzipFile(
                        fileobj=io.BytesIO(raw)
                    )  # member-concatenated gzip streams read seamlessly
                else:
                    stream = io.BytesIO(raw)
                rows: list[dict] = []
                for rec in _iter_warc_records(stream):
                    row = _response_row(rec, base)
                    if row is None:
                        continue
                    rows.append(row)
                    if len(rows) >= 500:  # bounded output batches
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(parse_files, WARC_RECORD_SCHEMA)


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Adapt WARC response records to the corpus `pages` schema
    (url, warc_ts, html, text, lang); text/lang are not carried by
    WARC — downstream extraction fills them."""
    return records.where(F.col("http_status") == 200).select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def _warc_date(ts) -> str:
    """WARC-Date header value; a null/NaT timestamp (PAGES_SCHEMA
    allows it) becomes the Unix epoch instead of crashing the writer
    task (pd.Timestamp(None).strftime raises on NaT)."""
    t = pd.Timestamp(ts)
    if pd.isna(t):
        return "1970-01-01T00:00:00Z"
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _format_record(url: str, ts, html: bytes, content_type: str) -> bytes:
    date = _warc_date(ts)
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: "
        + content_type.encode("latin-1")
        + b"\r\nContent-Length: "
        + str(len(html)).encode()
        + b"\r\n\r\n"
        + html
    )
    # record id derives from the url so output is deterministic
    rid = uuid.uuid5(uuid.NAMESPACE_URL, url)
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("latin-1")
    return head + http + b"\r\n\r\n"


def write_warc(pages: DataFrame, out_dir: str,
               content_type: str = "text/html") -> DataFrame:
    """Distributed WARC sink: each input partition writes one
    ``part-<n>.warc.gz`` (one gzip member per record, the Common Crawl
    layout) under `out_dir`. Returns the materialized manifest
    (warc_file, n_records) — the action that runs the write."""
    os.makedirs(out_dir, exist_ok=True)
    manifest_schema = "warc_file string, n_records long"

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.warc.gz"
        n = 0
        buf = io.BytesIO()
        cdx_lines: list[str] = []
        for pdf in batches:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                if url is None or html is None:
                    continue
                body = bytes(html)
                rec = _format_record(str(url), ts, body, content_type)
                offset = buf.tell()
                with gzip.GzipFile(fileobj=buf, mode="ab", mtime=0) as gz:
                    gz.write(rec)  # one member per record
                cdx_lines.append("\t".join((
                    str(url),
                    _warc_date(ts),
                    str(offset),
                    str(buf.tell() - offset),
                    hashlib.sha1(body).hexdigest(),
                    fname,
                )))
                n += 1
        if n:
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(buf.getvalue())
            cdx_name = fname[: -len(".warc.gz")] + ".cdx"
            with open(os.path.join(out_dir, cdx_name), "w") as f:
                f.write("\n".join(cdx_lines) + "\n")
        yield pd.DataFrame({"warc_file": [fname], "n_records": [n]})

    sel = pages.select("url", "warc_ts", "html")
    out = sel.mapInPandas(write_partition, manifest_schema)
    return out.where(F.col("n_records") > 0).localCheckpoint(eager=True)


_CDX_RAW_SCHEMA = ("url string, ts string, offset long, length long, "
                   "digest string, warc_file string")
_WARC_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Load ``*.cdx`` index files under `path` into a DataFrame
    ``(url, warc_ts, offset, length, digest, warc_file)``. The index is
    tiny relative to the warcs (~100 bytes/record vs ~10 KB/record), so
    filters/joins against it never touch page bytes — prune on the CDX,
    then ``fetch_records`` only what survived."""
    raw = (
        spark.read.schema(_CDX_RAW_SCHEMA)
        .option("sep", "\t")
        .option("pathGlobFilter", "*.cdx")
        .csv(path)
    )
    return raw.select(
        "url",
        F.to_timestamp("ts", _WARC_TS_FMT).alias("warc_ts"),
        "offset",
        "length",
        "digest",
        "warc_file",
    )


def record_at(warc_path: str, offset: int, length: int) -> dict:
    """Random-access ONE record: read `length` bytes at `offset` (one
    gzip member), decompress, parse. This is the CDX contract — on
    object storage the same slice is a ranged GET. Driver-side utility;
    the distributed twin is ``fetch_records``."""
    with open(warc_path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    rec = next(_iter_warc_records(gzip.GzipFile(fileobj=io.BytesIO(blob))))
    row = _response_row(rec, os.path.basename(warc_path))
    if row is None:
        raise ValueError(f"record at {offset} is not a response record")
    return row


def fetch_records(cdx: DataFrame, warc_dir: str) -> DataFrame:
    """Distributed CDX random access: fetch exactly the records named
    by the `cdx` rows (any subset/filter of ``read_cdx`` output) from
    the warc files under `warc_dir`.

    Scale shape: shuffle the index rows by ``warc_file`` so each task
    owns whole files, then read that file's wanted members in offset
    order — one open + monotonic forward seeks per file (sequential I/O
    on disk, coalescible ranged GETs on object storage). Only the
    selected members are ever read or decompressed.
    """
    sel = (
        cdx.select("warc_file", "offset", "length")
        .repartition("warc_file")
        .sortWithinPartitions("warc_file", "offset")
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        open_path: str | None = None
        fh = None
        rows: list[dict] = []
        try:
            for pdf in batches:
                for wf, off, ln in zip(
                    pdf["warc_file"], pdf["offset"], pdf["length"]
                ):
                    path = os.path.join(warc_dir, str(wf))
                    if path != open_path:
                        if fh is not None:
                            fh.close()
                        fh = open(path, "rb")
                        open_path = path
                    fh.seek(int(off))
                    blob = fh.read(int(ln))
                    rec = next(
                        _iter_warc_records(gzip.GzipFile(fileobj=io.BytesIO(blob)))
                    )
                    row = _response_row(rec, str(wf))
                    if row is None:
                        continue
                    rows.append(row)
                    if len(rows) >= 500:  # bounded output batches
                        yield pd.DataFrame(rows)
                        rows = []
        finally:
            if fh is not None:
                fh.close()
        if rows:
            yield pd.DataFrame(rows)

    return sel.mapInPandas(fetch, WARC_RECORD_SCHEMA)


# ------------------------------------------------------------ WET (text)

WET_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("wet_file", T.StringType()),
    ]
)


def _format_wet_record(url: str, ts, text: str) -> bytes:
    """One WET 'conversion' record (the Common Crawl extracted-text
    companion format): Content-Type text/plain, WARC-Refers-To pointing
    at the uuid5 id write_warc gives the same URL's response record —
    so a (WARC, WET) pair written by this engine cross-references
    exactly like a Common Crawl segment pair does."""
    body = text.encode("utf-8")
    date = _warc_date(ts)
    rid = uuid.uuid5(uuid.NAMESPACE_URL, "wet:" + url)
    refers = uuid.uuid5(uuid.NAMESPACE_URL, url)
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Refers-To: <urn:uuid:{refers}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1")
    return head + body + b"\r\n\r\n"


def write_wet(pages: DataFrame, out_dir: str, text_col: str = "text") -> DataFrame:
    """Distributed WET sink: one ``part-<n>.warc.wet.gz`` per input
    partition (member-gzip, mirroring write_warc). Input needs
    (url, warc_ts, `text_col`); rows with NULL url/text are skipped.
    Returns the (wet_file, n_records) manifest, materialized."""
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.warc.wet.gz"
        n = 0
        buf = io.BytesIO()
        for pdf in batches:
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["_t"]):
                if url is None or text is None:
                    continue
                rec = _format_wet_record(str(url), ts, str(text))
                with gzip.GzipFile(fileobj=buf, mode="ab", mtime=0) as gz:
                    gz.write(rec)
                n += 1
        if n:
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(buf.getvalue())
        yield pd.DataFrame({"wet_file": [fname], "n_records": [n]})

    sel = pages.select("url", "warc_ts", F.col(text_col).alias("_t"))
    out = sel.mapInPandas(write_partition, "wet_file string, n_records long")
    return out.where(F.col("n_records") > 0).localCheckpoint(eager=True)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET conversion records under `path` into
    WET_RECORD_SCHEMA. Same parallelism grain as read_warc: one task
    per file, streaming parse, bounded output batches."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(path)
        .select("path", "content")
    )

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if fpath.endswith(".gz"):
                    stream: io.BufferedIOBase = gzip.GzipFile(fileobj=io.BytesIO(raw))
                else:
                    stream = io.BytesIO(raw)
                rows: list[dict] = []
                for rec in _iter_warc_records(stream):
                    h = rec["headers"]
                    if h.get("warc-type") != "conversion":
                        continue
                    rows.append({
                        "url": h.get("warc-target-uri"),
                        "warc_ts": pd.Timestamp(h.get("warc-date")),
                        "text": rec["payload"].decode("utf-8", "replace"),
                        "wet_file": os.path.basename(fpath),
                    })
                    if len(rows) >= 500:
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(parse_files, WET_RECORD_SCHEMA)
