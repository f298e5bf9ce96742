"""Degree histogram (plans/degree.py)."""

from prec_spark.entry_queries import _kg_degree_dist, _kg_triples_oracle
from prec_spark.plans.components import cc_graph
from prec_spark.plans.degree import degree_histogram, degree_oracle_sql

from .conftest import SF_DIR
from .oracle_util import compare


def test_bit_length_buckets(spark):
    """Star with 5 leaves: hub deg 5 -> bucket 3 ([4,8)); leaves deg 1
    -> bucket 1."""
    und = cc_graph(
        spark.createDataFrame(
            [("h", f"l{i}") for i in range(5)], "src string, dst string"
        )
    )[0]
    got = {r.bucket: (r.n_nodes, r.min_deg, r.max_deg)
           for r in degree_histogram(und).collect()}
    assert got == {1: (5, 1, 1), 3: (1, 5, 5)}


def test_kg_degree_dist_oracle(spark):
    compare(
        _kg_degree_dist(spark, SF_DIR),
        degree_oracle_sql(_kg_triples_oracle()),
        SF_DIR,
    )
