"""PREC-0 expansion goldens (re-expressed from
/root/reference/test/prec_impl/prec-0.test.ts)."""

from prec_spark.pg.apoc import apoc_to_pg
from prec_spark.prec0 import prec0_quads
from prec_spark.rdf.isomorphism import isomorphic
from prec_spark.rdf.turtle import parse_turtle

PREFIXES = """
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix pgo:  <http://ii.uwb.edu.pl/pgo#> .
@prefix prec: <http://bruy.at/prec#> .
@prefix nl: <http://www.example.org/vocab/node/label/> .
@prefix el: <http://www.example.org/vocab/edge/label/> .
"""


def golden(ttl: str):
    return [(q.s.nt(), q.p.nt(), q.o.nt()) for q in parse_turtle(PREFIXES + ttl)]


def run(spark, jsonl: str):
    nodes, edges = apoc_to_pg(spark, jsonl)
    return [(r.s, r.p, r.o) for r in prec0_quads(nodes, edges).collect()]


def test_empty_graph(spark):
    assert run(spark, "") == []


def test_one_node_three_labels(spark):
    rows = run(
        spark, '{"type":"node","id":"1","labels":["Person","Father","President"]}'
    )
    expected = golden("""
        _:node a nl:Person, nl:Father, nl:President, pgo:Node .
        nl:Person rdfs:label "Person" ; a prec:CreatedNodeLabel .
        nl:President rdfs:label "President" ; a prec:CreatedNodeLabel .
        nl:Father rdfs:label "Father" ; a prec:CreatedNodeLabel .
        prec:CreatedNodeLabel rdfs:subClassOf prec:CreatedVocabulary .
    """)
    assert isomorphic(rows, expected)


def test_alice_is_named(spark):
    rows = run(
        spark,
        '{"type":"node","id":"1","labels":["Person"],"properties":{"name":"Alice"}}',
    )
    expected = golden("""
        _:alice a nl:Person, pgo:Node .
        nl:Person rdfs:label "Person" ; a prec:CreatedNodeLabel .
        _:alice <http://www.example.org/vocab/node/property/name/Person> [
          a prec:PropertyKeyValue ;
          rdf:value "Alice"
        ] .
        <http://www.example.org/vocab/node/property/name/Person>
            a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "name" .
        prec:CreatedPropertyKey rdfs:subClassOf prec:CreatedVocabulary .
        prec:CreatedNodeLabel rdfs:subClassOf prec:CreatedVocabulary .
    """)
    assert isomorphic(rows, expected)


def test_edge_reification(spark):
    rows = run(
        spark,
        """
{"type":"node","id":"1","labels":["Person"],"properties":{"name":"Alice"}}
{"type":"node","id":"2","labels":["Incorporation"],"properties":{"name":"ACME"}}
{"type":"relationship","id":"3","label":"worksFor","start":{"id":"1"},"end":{"id":"2"}}
""",
    )
    expected = golden("""
        _:alice a nl:Person, pgo:Node .
        nl:Person rdfs:label "Person" ; a prec:CreatedNodeLabel .
        _:alice <http://www.example.org/vocab/node/property/name/Person> [
          a prec:PropertyKeyValue ; rdf:value "Alice" ] .
        <http://www.example.org/vocab/node/property/name/Person>
            a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "name" .

        _:acme a pgo:Node, nl:Incorporation .
        nl:Incorporation rdfs:label "Incorporation" ; a prec:CreatedNodeLabel .
        _:acme <http://www.example.org/vocab/node/property/name/Incorporation> [
          a prec:PropertyKeyValue ; rdf:value "ACME" ] .
        <http://www.example.org/vocab/node/property/name/Incorporation>
            a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "name" .

        _:edge a pgo:Edge ;
          rdf:subject _:alice ;
          rdf:predicate el:worksFor ;
          rdf:object _:acme .
        el:worksFor rdfs:label "worksFor" ; a prec:CreatedEdgeLabel .
        prec:CreatedEdgeLabel rdfs:subClassOf prec:CreatedVocabulary .
        prec:CreatedPropertyKey rdfs:subClassOf prec:CreatedVocabulary .
        prec:CreatedNodeLabel rdfs:subClassOf prec:CreatedVocabulary .
    """)
    assert isomorphic(rows, expected)


def test_array_property_becomes_rdf_list(spark):
    rows = run(
        spark,
        '{"type":"node","id":"1","labels":["L"],"properties":{"xs":[1,2]}}',
    )
    expected = golden("""
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        _:n a nl:L, pgo:Node .
        nl:L rdfs:label "L" ; a prec:CreatedNodeLabel .
        _:n <http://www.example.org/vocab/node/property/xs/L> _:pv .
        _:pv a prec:PropertyKeyValue ; rdf:value _:l1 .
        _:l1 rdf:first "1"^^xsd:integer ; rdf:rest _:l2 .
        _:l2 rdf:first "2"^^xsd:integer ; rdf:rest rdf:nil .
        <http://www.example.org/vocab/node/property/xs/L>
            a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "xs" .
        prec:CreatedPropertyKey rdfs:subClassOf prec:CreatedVocabulary .
        prec:CreatedNodeLabel rdfs:subClassOf prec:CreatedVocabulary .
    """)
    assert isomorphic(rows, expected)
