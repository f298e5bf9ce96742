"""Stress/parity test on the reference's largest fixture: the Neo4j
"Movies" graph (253 Cypher rows, ~170 PG elements) through PREC-0 and
the PREC-C movies context (data/movies_vocab_Apply.ttl)."""

import json
import pathlib

import pytest

from prec_spark.pg.cypher import cypher_to_pg
from prec_spark.prec0 import prec0_quads
from prec_spark.prec0_revert import prec0_revert
from prec_spark.precc.apply import apply_precc
from prec_spark.precc.context import PreccContext

DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="module")
def movies(spark):
    rows = json.loads((DATA / "movies_cypher_all.json").read_text())
    return rows, cypher_to_pg(spark, rows)


def test_loader_dedups(spark, movies):
    rows, (nodes, edges) = movies
    ids = {r["src"]["identity"] for r in rows} | {r["dest"]["identity"] for r in rows}
    assert nodes.count() == len(ids)
    assert edges.count() == len({r["edge"]["identity"] for r in rows})


def test_movies_prec0_roundtrip(spark, movies):
    rows, (nodes, edges) = movies
    quads = prec0_quads(nodes, edges)
    rnodes, redges = prec0_revert(spark, quads)
    assert rnodes.count() == nodes.count()
    assert redges.count() == edges.count()
    # spot-check one node's labels+properties survive
    orig = {tuple(r.labels) for r in nodes.collect()}
    rev = {tuple(r.labels) for r in rnodes.collect()}
    assert rev == orig


def test_movies_precc_context(spark, movies):
    rows, (nodes, edges) = movies
    quads = prec0_quads(nodes, edges)
    ctx = PreccContext.from_turtle((DATA / "movies_vocab_Apply.ttl").read_text())
    out = apply_precc(spark, quads, ctx)
    triples = {(r.s, r.p, r.o) for r in out.collect()}

    # KeepProvenance false: no pgo typing anywhere
    assert not any("pgo#Node" in o or "pgo#Edge" in o for (_, p, o) in triples if p.endswith("#type>"))

    # every ACTED_IN edge becomes << src schema:actor dst >> (RdfStarUnique)
    n_acted = len({r["edge"]["identity"] for r in rows if r["edge"]["type"] == "ACTED_IN"})
    actor_triples = {t for t in triples if t[1] == "<http://schema.org/actor>"}
    acted_pairs = {
        (r["edge"]["start"], r["edge"]["end"])
        for r in rows
        if r["edge"]["type"] == "ACTED_IN"
    }
    assert len(actor_triples) == len(acted_pairs)  # RDF-star dedups parallel edges

    # roles arrays remapped to example.org/role, values kept as rdf lists
    role_triples = [t for t in triples if t[1] == "<http://example.org/role>"]
    n_roles = len({
        r["edge"]["identity"] for r in rows
        if r["edge"]["type"] == "ACTED_IN" and "roles" in (r["edge"].get("properties") or {})
    })
    assert len(role_triples) == n_roles
    # list chains preserved for multi-role actors
    assert any(o.startswith("_:list") for (_, _, o) in role_triples)

    # other labels (DIRECTED etc.) still use RdfStarUnique with their
    # created IRIs and keep their rdfs:label metadata
    directed = [t for t in triples if "edge/label/DIRECTED" in t[1]]
    assert directed
    assert any(
        p == "<http://www.w3.org/2000/01/rdf-schema#label>" and o == '"DIRECTED"'
        for (s, p, o) in triples
    )
