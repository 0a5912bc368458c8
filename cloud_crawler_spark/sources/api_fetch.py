"""JSON-API batch fetch (C6) — the working Spark analog of the
reference's BatchApiJob stub.

BatchApiJob (batch_api_job.rb:48-69) sketches: authenticate a client
in the pre-batch hook (do_pre_batch_with_auth, :71-77), GET each job's
URL as JSON, run the DSL's json blocks, then key every doc by its
hashcode into the doc store in the post-batch hook
(do_post_batch_with_docstore, :79-92) unless ``discard_page``. The
reference's transport (http_party.rb:25-69) is non-functional, so this
module implements the INTENT with the engine's injectable transport:

* ``auth_factory`` runs once per partition before any request and
  returns the auth headers every request carries — the per-client
  login of do_pre_batch_with_auth.
* bodies are parsed as JSON; the stored ``doc_json`` is canonical
  (sorted keys) so ``doc_id = sha1(doc_json)`` is the deterministic
  analog of ``json.hashcode`` (batch_api_job.rb:65).
* a parse failure or transport error lands as an error row
  (``fetched=false`` semantics of the page path), never a crash.
* ``store_docs`` commits the good docs to the FrontierStore doc table
  (S8) unless ``discard_doc``.

Plan shape: one ``mapInPandas`` over the host-partitioned URL slice —
identical scaling envelope to the page fetch stage (per-partition
session + auth reuse, no shuffle beyond the host repartition).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloud_crawler_spark.sources.http_fetch import _attempt

API_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("doc_json", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("response_time", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


class DictJsonTransport:
    """In-process fake JSON API: url -> python object served as JSON.
    Lives in the package (not the test tree) so Spark python workers
    unpickle it by reference, like DictTransport. With echo_headers the
    served object gains a ``_headers`` key carrying the request's
    headers — how tests assert the auth headers actually rode the
    request (the worker is otherwise opaque)."""

    def __init__(self, site: dict, echo_headers: bool = False):
        self.site = site
        self.echo_headers = echo_headers

    def __call__(self, url: str, referer: Optional[str],
                 headers: Optional[dict] = None):
        from cloud_crawler_spark.sources.http_fetch import FetchResponse

        obj = self.site.get(url)
        if obj is None:
            return FetchResponse(code=404, body=b"{}", content_type="application/json",
                                 response_time=1)
        if isinstance(obj, (bytes, str)):  # raw body (e.g. invalid JSON)
            body = obj if isinstance(obj, bytes) else obj.encode()
        else:
            if self.echo_headers:
                obj = {**obj, "_headers": dict(headers or {})}
            body = json.dumps(obj).encode()
        return FetchResponse(code=200, body=body, content_type="application/json",
                             response_time=1)


class ApiFetcher:
    """Callable stage: (urls_df[url, host?], ...) -> docs_df(API_SCHEMA)."""

    def __init__(
        self,
        transport_factory: Callable[[], Callable],
        auth_factory: Optional[Callable[[], dict]] = None,
        retries: int = 3,
        n_partitions: Optional[int] = None,
        discard_doc: bool = False,  # opts[:discard_page], batch_api_job.rb:66
    ):
        self.transport_factory = transport_factory
        self.auth_factory = auth_factory
        self.retries = retries
        self.n_partitions = n_partitions
        self.discard_doc = discard_doc

    def __call__(self, urls: DataFrame) -> DataFrame:
        factory = self.transport_factory
        auth_factory = self.auth_factory
        retries = self.retries

        def fetch_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            transport = factory()
            headers = auth_factory() if auth_factory else None  # pre-batch auth
            for pdf in pdfs:
                rows = []
                for url in pdf["url"]:
                    rows.append(_fetch_json(transport, url, retries, headers))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in API_SCHEMA.fields], dtype=object
                )

        if "host" in urls.columns:
            sliced = (
                urls.repartition(self.n_partitions, "host")
                if self.n_partitions
                else urls.repartition("host")
            )
        else:
            sliced = urls
        return sliced.select("url").mapInPandas(fetch_partition, schema=API_SCHEMA)

    def store_docs(self, store, rnd: int, fetched: DataFrame) -> None:
        """do_post_batch_with_docstore (batch_api_job.rb:79-92): commit
        parsed docs keyed by doc_id unless discard_doc."""
        if self.discard_doc:
            return
        good = fetched.where(F.col("doc_json").isNotNull()).select(
            F.col("doc_id").alias("canon_url"), "url", "doc_json"
        )
        store.commit_docs(rnd, good)


def _fetch_json(transport, url: str, retries: int,
                headers: Optional[dict]) -> dict:
    try:
        resp = _attempt(transport, url, None, retries, headers)
    except Exception as e:  # noqa: BLE001 — reference rescues Exception
        return {"url": url, "code": None, "doc_json": None, "doc_id": None,
                "response_time": None, "error": f"{type(e).__name__}: {e}"}
    if resp.code != 200 or resp.body is None:
        return {"url": url, "code": resp.code, "doc_json": None, "doc_id": None,
                "response_time": resp.response_time,
                "error": f"http {resp.code}"}
    try:
        doc = json.loads(resp.body)
    except ValueError as e:
        return {"url": url, "code": resp.code, "doc_json": None, "doc_id": None,
                "response_time": resp.response_time,
                "error": f"json: {e}"}
    canon = json.dumps(doc, sort_keys=True, separators=(",", ":"))
    return {
        "url": url,
        "code": resp.code,
        "doc_json": canon,
        "doc_id": hashlib.sha1(canon.encode()).hexdigest(),
        "response_time": resp.response_time,
        "error": None,
    }
