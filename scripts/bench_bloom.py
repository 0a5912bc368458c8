"""Bloom-probe cost/benefit at bench scale (VERDICT r2 item #6).

The default bench crawl starts from an empty seen set, where the Bloom
path has nothing to do — its value is the RESUME/recurring shape: a
large accumulated seen table gating each round's candidate set. This
micro-bench isolates exactly that gate at a scale proxy:

  seen       = N_SEEN canonical URLs (the accumulated crawl history)
  candidates = N_CAND frontier rows, OVERLAP fraction already seen

and times three strategies producing identical output:

  exact    — plain LEFT ANTI join (config.use_bloom=False, the default)
  bloom_bc — partitioned Bloom build + broadcast probe + exact residue
             (use_bloom=True, filters under bloom_broadcast_max_bytes)
  bloom_cg — same but the probe cogroups candidates with their
             bucket's filter row executor-side (the 10^10-URL path
             where the filter set is too big to broadcast)

Bloom build time is INCLUDED (honest total cost); at a real 10^10
frontier the filters are maintained incrementally across rounds, so
the steady-state cost is probe-only — reported separately.

Run: python scripts/bench_bloom.py [n_seen] [n_cand] [overlap] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import build_spark  # noqa: E402
from cloud_crawler_spark.operators.seen import (  # noqa: E402
    anti_join_seen,
    bloom_gate,
    bloom_maybe_seen,
    bloom_maybe_seen_cogroup,
    build_bloom_filters,
)


def _urls(spark, n: int, start: int = 0):
    return spark.range(start, start + n).select(
        F.concat(
            F.lit("http://h"), (F.col("id") % 997).cast("string"),
            F.lit(".ex.com/p"), F.col("id").cast("string"),
        ).alias("canon_url")
    )


def main():
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_cand = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    overlap = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    seen = _urls(spark, n_seen).cache()
    seen.count()
    # candidates: the first overlap*n_cand ids fall inside [0, n_seen)
    cand_start = n_seen - int(n_cand * overlap)
    cand = _urls(spark, n_cand, start=cand_start).cache()
    cand.count()

    out = {"n_seen": n_seen, "n_cand": n_cand, "overlap": overlap, "cpus": cpus}

    def timed(tag, fn):
        t0 = time.time()
        n = fn().count()
        out[f"{tag}_sec"] = round(time.time() - t0, 3)
        out[f"{tag}_rows"] = n

    # warm both code paths once (JIT, python worker spawn)
    anti_join_seen(cand.limit(1000), seen.limit(1000)).count()
    bloom_gate(cand.limit(1000), seen.limit(1000)).count()

    timed("exact", lambda: anti_join_seen(cand, seen))
    timed("bloom_bc", lambda: bloom_gate(cand, seen,
                                         broadcast_max_bytes=1 << 30))
    timed("bloom_cg", lambda: bloom_gate(cand, seen, broadcast_max_bytes=0))

    # steady-state split: build once, time the probe alone
    filters = build_bloom_filters(seen).cache()
    t0 = time.time()
    filters.count()
    out["bloom_build_sec"] = round(time.time() - t0, 3)
    for tag, probe in (("probe_bc", bloom_maybe_seen),
                       ("probe_cg", bloom_maybe_seen_cogroup)):
        t0 = time.time()
        probed = probe(cand, filters)
        new = probed.where(~F.col("maybe_seen")).drop("maybe_seen", "url_hash")
        maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen", "url_hash")
        n = new.unionByName(anti_join_seen(maybe, seen)).count()
        out[f"{tag}_sec"] = round(time.time() - t0, 3)
        out[f"{tag}_rows"] = n

    out["identical_output"] = (
        out["exact_rows"] == out["bloom_bc_rows"] == out["bloom_cg_rows"]
        == out["probe_bc_rows"] == out["probe_cg_rows"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
