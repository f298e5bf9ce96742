"""Replicates the driver's Spark-vs-DuckDB correctness gate locally for
every registered query."""

import pytest

from prec_spark.entry_queries import oracle_sql, queries

from .oracle_util import compare

CASES = sorted(queries().keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = queries()[name]
    sql = oracle_sql().get(name)
    if sql is None:
        df = q(spark, sf_dir)
        assert df.count() >= 0
        return
    compare(q(spark, sf_dir), sql, sf_dir)
