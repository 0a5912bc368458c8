"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full BFS crawl over a synthetic web derived
                 from the sf0.001 documents table, returning per-URL
                 crawl depth (the engine end-to-end: frontier rounds,
                 politeness, seen anti-join, pandas-UDF parse, gates).
queries()      — operator registry (SURVEY.md §2 + training-data ops),
                 each callable (spark, sf_dir) -> DataFrame.
oracle_sql()   — matching ANSI-SQL strings DuckDB runs on the same
                 tables; omitted entries get the rows-only check.

Implementation lives in cloud_crawler_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cloud_crawler_spark.queries import q_crawl_bfs

    return q_crawl_bfs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cloud_crawler_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from cloud_crawler_spark.queries import oracle_sql as _o

    return _o()
