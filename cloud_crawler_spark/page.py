"""Page serialization parity — the reference's to_hash/from_hash.

Page#to_hash (page.rb:255-268) serializes exactly twelve fields:
url, headers, data, body, links, code, visited, depth, referer,
redirect_to, response_time, fetched — with nil URL-ish fields
stringified to "" (``@referer.to_s``). Page.from_hash (page.rb:271-288)
round-trips with coercions: ``to_i`` on code/depth/response_time (Ruby
``nil.to_i == 0``), redirect_to back to nil when empty.

Our crawled table carries every to_hash field natively except:
* ``data`` — the reference's schemaless user OpenStruct; emitted as an
  empty map (user state lives in real columns here).

``headers`` is the crawled table's map<string,array<string>> column —
the full Net::HTTPResponse#to_hash capture on live fetches
(sources/http_fetch.FetchResponse.headers), the 1-key
{'content-type': [...]} reconstruction on corpus fetches (page.rb:66-67
defaults headers['content-type'] to ['']).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TO_HASH_FIELDS = [
    "url", "headers", "data", "body", "links", "code", "visited",
    "depth", "referer", "redirect_to", "response_time", "fetched",
]


def to_hash_df(crawled: DataFrame) -> DataFrame:
    """Project a crawled DataFrame onto the reference's to_hash shape
    (one column per to_hash key, exact names, nil-to_s semantics)."""
    headers_col = (
        F.col("headers")
        if "headers" in crawled.columns
        else F.lit(None).cast("map<string,array<string>>")
    )
    return crawled.select(
        F.col("url"),
        F.coalesce(
            headers_col,
            F.create_map(
                F.lit("content-type"),
                F.array(F.coalesce(F.col("content_type"), F.lit(""))),
            ),
        ).alias("headers"),
        F.create_map().cast("map<string,string>").alias("data"),
        F.col("html").cast("string").alias("body"),
        F.col("links"),
        F.col("code"),
        F.col("visited"),
        F.col("depth"),
        F.coalesce(F.col("referer"), F.lit("")).alias("referer"),        # @referer.to_s
        F.coalesce(F.col("redirect_to"), F.lit("")).alias("redirect_to"),  # .to_s
        F.col("response_time"),
        F.col("fetched"),
    )


def page_to_hash(row) -> dict:
    """One crawled Row -> the reference's to_hash dict."""
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    body = d.get("html")
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="ignore")
    headers = d.get("headers")
    if headers is not None:
        headers = {k: list(v) for k, v in dict(headers).items()}
    else:
        headers = {"content-type": [d.get("content_type") or ""]}
    return {
        "url": d.get("url") or "",
        "headers": headers,
        "data": {},
        "body": body,
        "links": list(d.get("links") or []),
        "code": d.get("code"),
        "visited": d.get("visited"),
        "depth": d.get("depth"),
        "referer": d.get("referer") or "",
        "redirect_to": d.get("redirect_to") or "",
        "response_time": d.get("response_time"),
        "fetched": d.get("fetched"),
    }


def page_from_hash(h: dict) -> dict:
    """Page.from_hash coercions (page.rb:271-288): to_i on
    code/depth/response_time (nil -> 0), empty redirect_to -> None."""
    return {
        "url": h["url"],
        "headers": h.get("headers") or {"content-type": [""]},
        "data": h.get("data") or {},
        "body": h.get("body"),
        "links": list(h.get("links") or []),
        "code": int(h["code"]) if h.get("code") is not None else 0,
        "visited": h.get("visited"),
        "depth": int(h["depth"]) if h.get("depth") is not None else 0,
        "referer": h.get("referer"),
        "redirect_to": h["redirect_to"] if h.get("redirect_to") else None,
        "response_time": int(h["response_time"]) if h.get("response_time") is not None else 0,
        "fetched": h.get("fetched"),
    }
