"""PREC-0 round trip: PG -> PREC-0 quads -> PG (totality-checked)."""

import pytest

from prec_spark.pg.apoc import apoc_to_pg
from prec_spark.prec0 import prec0_quads
from prec_spark.prec0_revert import Prec0ReversionError, prec0_revert

PG = """
{"type":"node","id":"1","labels":["Person"],"properties":{"name":"Alice","age":30}}
{"type":"node","id":"2","labels":["Incorporation","Employer"],"properties":{"name":"ACME","tags":["a","b"]}}
{"type":"relationship","id":"3","label":"worksFor","start":{"id":"1"},"end":{"id":"2"},"properties":{"since":2020}}
"""


def test_prec0_round_trip(spark):
    nodes, edges = apoc_to_pg(spark, PG)
    quads = prec0_quads(nodes, edges)
    rnodes, redges = prec0_revert(spark, quads)

    orig_nodes = {
        tuple(r.labels): dict(r.properties) for r in nodes.collect()
    }
    rev_nodes = {tuple(r.labels): dict(r.properties) for r in rnodes.collect()}
    assert rev_nodes == orig_nodes

    orig_edges = [
        (r.label, dict(r.properties)) for r in edges.collect()
    ]
    rev_edges = [(r.label, dict(r.properties)) for r in redges.collect()]
    assert rev_edges == orig_edges
    # endpoint identity is preserved up to the deterministic bnode rename
    re = redges.collect()[0]
    node_map = {tuple(r.labels): r.node_id for r in rnodes.collect()}
    assert re.src_id == node_map[("Person",)]
    assert re.dst_id == node_map[("Employer", "Incorporation")]


def test_totality_check_rejects_foreign_quads(spark):
    nodes, edges = apoc_to_pg(spark, PG)
    quads = prec0_quads(nodes, edges).unionByName(
        spark.createDataFrame(
            [("<http://x>", "<http://not-prec0/p>", '"v"')],
            "s STRING, p STRING, o STRING",
        )
    )
    with pytest.raises(Prec0ReversionError):
        prec0_revert(spark, quads)
