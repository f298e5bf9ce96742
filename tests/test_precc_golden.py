"""PREC-C golden tests, re-expressed from the reference suite
(/root/reference/test/prec_impl/rules-for-edges.test.ts,
test/prec/ex1_potus.test.ttl:1-19, ex2_anndan.test.ttl:69-87)."""

from prec_spark.pg.apoc import apoc_to_pg
from prec_spark.prec0 import prec0_quads
from prec_spark.precc.apply import apply_precc
from prec_spark.precc.context import PreccContext
from prec_spark.rdf.isomorphism import isomorphic
from prec_spark.rdf.turtle import parse_turtle

PREFIXES = """
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix pgo:  <http://ii.uwb.edu.pl/pgo#> .
@prefix prec: <http://bruy.at/prec#> .
@prefix pvar: <http://bruy.at/prec-trans#> .
@prefix :     <http://test/> .
"""


def to_triples(ttl: str):
    return [(q.s.nt(), q.p.nt(), q.o.nt()) for q in parse_turtle(PREFIXES + ttl)]


def run(spark, input_ttl: str, ctx_ttl: str):
    rows = to_triples(input_ttl)
    df = spark.createDataFrame(rows or [("x", "x", "x")], "s STRING, p STRING, o STRING")
    if not rows:
        df = df.filter("1=0")
    ctx = PreccContext.from_turtle(PREFIXES + ctx_ttl)
    out = apply_precc(spark, df, ctx)
    return [(r.s, r.p, r.o) for r in out.collect()]


ONE_EDGE = ":edge a pgo:Edge ; rdf:subject :s ; rdf:predicate :p ; rdf:object :o ."
ONE_EDGE_TYPE = ONE_EDGE + ' :p rdfs:label "type1" .'
EDGE_DIFF = """
:edge1 a pgo:Edge ; rdf:subject :s1 ; rdf:predicate :p1 ; rdf:object :o1 .
:edge2 a pgo:Edge ; rdf:subject :s2 ; rdf:predicate :p2 ; rdf:object :o2 .
:p1 rdfs:label "type1" .
:p2 rdfs:label "type2" .
"""
DIFFERENT_SOURCE_LABEL = """
:edge1 a pgo:Edge ; rdf:subject :person ; rdf:predicate :p ; rdf:object :o .
:edge2 a pgo:Edge ; rdf:subject :animal ; rdf:predicate :p ; rdf:object :o .
:p rdfs:label "Predicate" .
:person a [ rdfs:label "Person" ], pgo:Node .
:animal a [ rdfs:label "Animal" ], pgo:Node .
"""


def test_idempotency_no_context(spark):
    assert isomorphic(run(spark, ONE_EDGE, ""), to_triples(ONE_EDGE))


def test_idempotency_typed_edge(spark):
    assert isomorphic(run(spark, ONE_EDGE_TYPE, ""), to_triples(ONE_EDGE_TYPE))


def test_one_edge_rdf_star_unique(spark):
    out = run(spark, ONE_EDGE, "prec:Edges prec:templatedBy prec:RdfStarUnique .")
    assert isomorphic(out, to_triples(":s :p :o . << :s :p :o >> a pgo:Edge ."))


def test_one_edge_rdf_star_occurrence(spark):
    out = run(spark, ONE_EDGE, "prec:Edges prec:templatedBy prec:RdfStarOccurrence .")
    assert isomorphic(
        out, to_triples(":edge a pgo:Edge . :edge prec:occurrenceOf << :s :p :o >> .")
    )


def test_typed_edge_with_rule(spark):
    ctx = """
    prec:Edges prec:templatedBy prec:RdfStarUnique .
    :type1 prec:IRIOfEdgeLabel "type1" .
    """
    out = run(spark, ONE_EDGE_TYPE, ctx)
    assert isomorphic(out, to_triples(":s :type1 :o . << :s :type1 :o >> a pgo:Edge ."))


def test_mixed_ruled_and_default_edges(spark):
    ctx = """
    prec:Edges prec:templatedBy prec:RdfStarUnique .
    :type1 prec:IRIOfEdgeLabel "type1" .
    """
    out = run(spark, EDGE_DIFF, ctx)
    expected = to_triples("""
        :s1 :type1 :o1 . << :s1 :type1 :o1 >> a pgo:Edge .
        :s2 :p2 :o2 . << :s2 :p2 :o2 >> a pgo:Edge .
        :p2 rdfs:label "type2" .
    """)
    assert isomorphic(out, expected)


def test_source_label_condition(spark):
    ctx = """
    prec:Edges prec:templatedBy prec:RdfStarOccurrence .
    [] a prec:EdgeRule ;
        prec:edgeIRI :NewPredicate ;
        prec:templatedBy prec:RdfStarUnique ;
        prec:label "Predicate" ;
        prec:sourceLabel "Person" .
    """
    out = run(spark, DIFFERENT_SOURCE_LABEL, ctx)
    expected = to_triples("""
        << :person :NewPredicate :o >> a pgo:Edge .
        :person :NewPredicate :o .
        :edge2 a pgo:Edge .
        :edge2 prec:occurrenceOf << :animal :p :o >> .
        :p rdfs:label "Predicate" .
        :person a [ rdfs:label "Person" ], pgo:Node .
        :animal a [ rdfs:label "Animal" ], pgo:Node .
    """)
    assert isomorphic(out, expected)


def test_substitution_in_rdf_reification(spark):
    ctx = """
    prec:Edges prec:templatedBy prec:RDFReification ;
      prec:subject :source ;
      prec:predicate :label ;
      prec:object :target .
    """
    out = run(spark, ONE_EDGE, ctx)
    expected = to_triples(":edge a pgo:Edge ; :source :s ; :label :p ; :target :o .")
    assert isomorphic(out, expected)


def test_user_defined_template_with_substitutions(spark):
    ctx = """
    prec:Edges prec:templatedBy [ prec:produces
        << rdf:subject rdf:predicate rdf:object >> ,
        << pvar:destination pvar:edgeIRI pvar:source >>
    ] ;
      prec:subject   :source ;
      prec:predicate :label ;
      prec:object    :target .
    """
    out = run(spark, ONE_EDGE, ctx)
    assert isomorphic(out, to_triples(":source :label :target . :o :p :s ."))


def test_implicit_reification_renaming(spark):
    ctx = """
    prec:Edges prec:subject :source ; prec:predicate :label ; prec:object :target .
    """
    out = run(spark, ONE_EDGE, ctx)
    expected = to_triples(":edge a pgo:Edge ; :source :s ; :label :p ; :target :o .")
    assert isomorphic(out, expected)


def test_edge_direction_swap(spark):
    ctx = "prec:Edges prec:subject rdf:object ; prec:object rdf:subject ."
    out = run(spark, ONE_EDGE, ctx)
    expected = to_triples(
        ":edge a pgo:Edge ; rdf:object :s ; rdf:predicate :p ; rdf:subject :o ."
    )
    assert isomorphic(out, expected)


def test_label_in_edge_template(spark):
    ctx = """
    prec:Edges prec:templatedBy [ prec:produces
        << :anEdge :holdsTheLabel pvar:label >>
    ] .
    """
    out = run(spark, EDGE_DIFF, ctx)
    assert isomorphic(out, to_triples(':anEdge :holdsTheLabel "type1", "type2" .'))


# ------------------------------------------------------------------ e2e
def e2e(spark, pg_jsonl: str, ctx_path: str):
    import pathlib

    nodes, edges = apoc_to_pg(spark, pg_jsonl)
    quads = prec0_quads(nodes, edges)
    ctx = PreccContext.from_turtle(pathlib.Path(ctx_path).read_text())
    out = apply_precc(spark, quads, ctx)
    return [(r.s, r.p, r.o) for r in out.collect()]


POTUS_PG = """
{"type":"node","id":"1","labels":["PERSON"],"properties":{"name":"Biden","givenName": "Joseph"}}
{"type":"node","id":"2","labels":["COUNTRY"],"properties":{"name":"United States of America"}}
"""

ANN_DAN_PG = """
{"type":"node","id":"9","labels":["Person"],"properties":{"name":"Ann"}}
{"type":"node","id":"10","labels":["Person"],"properties":{"name":"Dan"}}
{"id":"12","type":"relationship","label":"Likes","start":{"id":"9","labels":["Person"]},"end":{"id":"10","labels":["Person"]}}
"""


def test_potus_precc_end_to_end(spark):
    out = e2e(spark, POTUS_PG, "/root/reference/data/ex1_precc.ttl")
    expected = to_triples("""
        @prefix schema: <https://schema.org/> .
        @prefix dbpedia: <http://dbpedia.org/ontology/> .
        _:joe a dbpedia:Person ;
            schema:givenName "Joseph" ;
            schema:familyName "Biden" .
        _:usa a dbpedia:Country ;
            <http://example.org/countryName> "United States of America" .
    """)
    assert isomorphic(out, expected)


def test_anndan_precc_end_to_end(spark):
    out = e2e(spark, ANN_DAN_PG, "/root/reference/data/ex2_precc.ttl")
    expected = to_triples("""
        @prefix ex: <http://example.org/> .
        @prefix dbpedia: <http://dbpedia.org/ontology/> .
        @prefix schema: <https://schema.org/> .
        _:ann a dbpedia:Person ; schema:name "Ann" .
        _:dan a dbpedia:Person ; schema:name "Dan" .
        _:like ex:likedBy _:ann ;
            ex:contentCreator _:dan ;
            rdf:type <https://example.org/likes> .
    """)
    assert isomorphic(out, expected)


DEEP_META_GRAPH = """
_:n a pgo:Node .
:p1 rdfs:label "p1" ; a prec:PropertyKey .
_:n :p1 _:pv1 . _:pv1 a prec:PropertyKeyValue ; rdf:value "v1" .
:m1 rdfs:label "m1" ; a prec:PropertyKey .
_:pv1 :m1 _:pv2 . _:pv2 a prec:PropertyKeyValue ; rdf:value "v2" .
:m2 rdfs:label "m2" ; a prec:PropertyKey .
_:pv2 :m2 _:pv3 . _:pv3 a prec:PropertyKeyValue ; rdf:value "v3" .
"""

DEEP_META_CTX = """
:M2Rule a prec:PropertyRule ;
  prec:propertyKey "m2" ;
  prec:templatedBy prec:DirectTriples .
"""


def test_meta_of_meta_deep_resolve(spark):
    """deepResolve recurses (rules-for-properties.ts:333-386): a
    meta-meta property (depth 2) must resolve its holder through the
    parent meta property's self — prior rounds only resolved depth 1."""
    out = run(spark, DEEP_META_GRAPH, DEEP_META_CTX)
    assert ("_:pv2", "<http://test/m2>", '"v3"') in out
    # depth-1 meta property still materializes under the base template
    assert ("_:pv1", "<http://test/m1>", "_:pv2") in out


ORPHAN_META_GRAPH = """
_:n a pgo:Node .
:m1 rdfs:label "m1" ; a prec:PropertyKey .
_:dangling :m1 _:pv . _:pv a prec:PropertyKeyValue ; rdf:value "v" .
"""


def test_orphaned_meta_property_raises(spark):
    """A meta property whose holder is not a node, an edge, or any
    property's value node cannot deep-resolve — hard error, not a
    silent drop."""
    import pytest

    with pytest.raises(ValueError, match="unresolvable holders"):
        run(spark, ORPHAN_META_GRAPH, DEEP_META_CTX)
