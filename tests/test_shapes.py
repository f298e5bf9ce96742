"""Shape inference (plans/shapes.py)."""

from prec_spark.entry_queries import _kg_shapes, _kg_triples_oracle
from prec_spark.plans.shapes import RDF_TYPE, shape_profile, shapes_oracle_sql

from .conftest import SF_DIR
from .oracle_util import compare


def _kg(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_cardinalities(spark):
    """Two Persons: one with 2 names + 1 age, one with 1 name only —
    name is carried by both (mandatory candidate, max 2), age by one
    (optional, functional)."""
    kg = _kg(
        spark,
        [
            ("p1", RDF_TYPE, "Person"),
            ("p2", RDF_TYPE, "Person"),
            ("p1", "name", '"A"'),
            ("p1", "name", '"B"'),
            ("p1", "age", '"3"'),
            ("p2", "name", '"C"'),
            ("x", "name", '"untyped"'),   # no type -> profiled nowhere
        ],
    )
    got = {
        (r.cls, r.pred): (
            r.n_subjects, r.n_with, r.total_objs,
            r.min_per_subject, r.max_per_subject,
        )
        for r in shape_profile(kg).collect()
    }
    assert got[("Person", "name")] == (2, 2, 3, 1, 2)
    assert got[("Person", "age")] == (2, 1, 1, 1, 1)
    assert got[("Person", RDF_TYPE)] == (2, 2, 2, 1, 1)
    assert len(got) == 3


def test_multi_typed_subject(spark):
    """A subject with two types contributes its predicates to BOTH
    class shapes."""
    kg = _kg(
        spark,
        [
            ("s", RDF_TYPE, "A"),
            ("s", RDF_TYPE, "B"),
            ("s", "p", "o1"),
        ],
    )
    got = {(r.cls, r.pred): r.n_with for r in shape_profile(kg).collect()}
    assert got[("A", "p")] == 1 and got[("B", "p")] == 1


def test_kg_shapes_oracle(spark):
    compare(
        _kg_shapes(spark, SF_DIR),
        shapes_oracle_sql(_kg_triples_oracle()),
        SF_DIR,
    )
