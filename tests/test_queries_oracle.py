"""Local re-implementation of the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB over the same
parquet tables (sf0.001), compare row count + column names + an
order-insensitive value hash. Catching mismatches here is much cheaper
than waiting for CORRECTNESS_r{N}.json."""

import hashlib
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # 12 significant digits: tight enough that any cross-engine
        # float drift that could flip the driver's (full-precision)
        # value hash fails HERE first (round 1's q03 lesson — the old
        # 6g normalization masked a last-cent double-summation flip)
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ALL = sorted(entrymod.queries())
WITH_ORACLE = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ALL)
def test_query_runs(spark, duck, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    rows = df.collect()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert rows is not None  # rows-only check
        return
    want = duck.sql(oracle)
    want_rows = want.fetchall()
    want_cols = [c.lower() for c in want.columns]
    got_cols = [c.lower() for c in df.columns]
    assert sorted(got_cols) == sorted(want_cols), f"{name}: column names differ"
    assert len(rows) == len(want_rows), f"{name}: row count {len(rows)} vs {len(want_rows)}"
    got_idx = {c: i for i, c in enumerate(got_cols)}
    got_rows = [tuple(r[got_idx[c]] for c in sorted(got_cols)) for r in rows]
    want_idx = {c: i for i, c in enumerate(want_cols)}
    want_rows2 = [tuple(r[want_idx[c]] for c in sorted(want_cols)) for r in want_rows]
    gh = _value_hash(got_rows, sorted(got_cols))
    wh = _value_hash(want_rows2, sorted(want_cols))
    if gh != wh:
        gs = sorted("|".join(_norm_cell(v) for v in r) for r in got_rows)
        ws = sorted("|".join(_norm_cell(v) for v in r) for r in want_rows2)
        diff = [(a, b) for a, b in zip(gs, ws) if a != b][:5]
        raise AssertionError(f"{name}: value hash mismatch; first diffs {diff}")
