"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001.
queries()    — one callable per implemented operator (SURVEY.md §2).
oracle_sql() — matching ANSI SQL for the DuckDB side-by-side check.

Implementation lives in prec_spark/ (see README.md / SURVEY.md).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts -> PG -> PRSC context -> canonical triples."""
    from prec_spark.flagship import flagship_triples

    return flagship_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from prec_spark.entry_queries import queries as q

    return q()


def oracle_sql() -> dict[str, str]:
    from prec_spark.entry_queries import oracle_sql as o

    return o()
