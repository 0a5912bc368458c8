"""Full-registry correctness sweep in the driver's artifact format.

Runs EVERY queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same parquet tables, compares row count + column names + an
order-insensitive value hash, and writes a CORRECTNESS_r{N}-shaped JSON
(one object keyed by query name with rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err per entry). The per-round driver gate samples
a 50-query prefix; this artifact is the committed evidence for the rest.

Usage:
    python scripts/oracle_sweep.py --sf-dir /root/testdata/sf0.01 \
        --out CORRECTNESS_local_r4_sf0.01.json [--only q_a,q_b]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("oracle-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    report, n_fail = {}, 0
    t_all = time.time()
    for i, name in enumerate(names):
        row = {
            "rows_match": False, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            # Registry outputs must be scalar-typed: the external
            # gate's pandas sort_values crashes on array cells
            # (CORRECTNESS_r04 q_embed_quantize). Queries emit
            # arrays comma-joined instead (array audit, r5).
            from pyspark.sql.types import ArrayType, MapType, StructType

            bad = [f.name for f in sdf.schema.fields
                   if isinstance(f.dataType, (ArrayType, MapType, StructType))]
            if bad:
                raise TypeError(
                    f"non-scalar output columns {bad}: emit them "
                    "stringified (array_join) in query AND oracle"
                )
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(srows)
            if name in oracles:
                res = con.sql(oracles[name])
                ocols = list(res.columns)
                orows = res.fetchall()
                row["oracle_rows"] = len(orows)
                row["rows_match"] = len(srows) == len(orows)
                row["schema_match"] = sorted(scols) == sorted(ocols)
                row["hash_match"] = (
                    row["schema_match"]
                    and _value_hash(srows, scols) == _value_hash(orows, ocols)
                )
                ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
                # Vacuous-green detector (VERDICT r4 'What's wrong' #2):
                # a 0-rows-vs-0-rows match verifies nothing — the
                # engines agree on an EMPTY answer, so the operator's
                # actual output was never value-checked. Flag it and
                # count it as a failure so an empty fixture can never
                # silently pass again (q_recurring_delta did for three
                # rounds).
                if ok and len(srows) == 0:
                    row["vacuous"] = True
                    row["err"] = "vacuous: 0-row match verifies nothing"
                    ok = False
            else:
                # No SQL oracle: the driver records a weaker rows-only
                # check. Record that DISTINCTLY (ADVICE r4) — it is
                # 'executed without crashing', not a verified answer —
                # and exclude it from the green count.
                row["no_oracle"] = True
                row["rows_match"] = None
                row["err"] = "no_oracle: rows-only execution, not verified"
                ok = False
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            row["err"] = f"{type(exc).__name__}: {exc}"[:500]
            ok = False
        if not ok:
            n_fail += 1
        report[name] = row
        print(
            f"[{i + 1}/{len(names)}] {name}: "
            f"{'OK' if ok else 'FAIL'} ({time.time() - t0:.1f}s)",
            flush=True,
        )

    out = args.out or f"CORRECTNESS_local_{os.path.basename(args.sf_dir)}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    n_vac = sum(1 for r in report.values() if r.get("vacuous"))
    n_noracle = sum(1 for r in report.values() if r.get("no_oracle"))
    print(
        f"wrote {out}: {len(names) - n_fail}/{len(names)} hash-green "
        f"({n_vac} vacuous, {n_noracle} no-oracle, "
        f"{n_fail - n_vac - n_noracle} failed) "
        f"in {time.time() - t_all:.0f}s",
        flush=True,
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
