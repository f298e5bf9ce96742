"""PREC-C property-rule goldens, re-expressed from
/root/reference/test/prec_impl/rules-for-properties-on-nodes.test.ts."""

from prec_spark.rdf.isomorphism import isomorphic

from .test_precc_golden import run, to_triples

ONE_PROP = """
:node a pgo:Node ; :p [ rdf:value "v1" ; a prec:PropertyKeyValue ] .
:p a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "P1" .
"""

TWO_PROPS = """
:node a pgo:Node ;
  :p1 [ rdf:value "v1" ; a prec:PropertyKeyValue ] ;
  :p2 [ rdf:value "v2" ; a prec:PropertyKeyValue ] .
:p1 a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "P1" .
:p2 a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "P2" .
"""

MULTI_VALUED = """
:node a pgo:Node ;
  :p [ rdf:value "v1" ; a prec:PropertyKeyValue ] ;
  :p [ rdf:value "v2" ; a prec:PropertyKeyValue ] .
:p a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "P1" .
"""

PGO_PROPERTY_CTX = """
prec:Properties prec:templatedBy [
  prec:produces
    << pvar:holder       pgo:hasProperty pvar:propertyNode  >> ,
    << pvar:propertyNode pgo:key         pvar:label         >> ,
    << pvar:propertyNode pgo:value       pvar:propertyValue >>
] .
"""


def test_idempotency_node_no_property(spark):
    assert isomorphic(run(spark, ":node a pgo:Node .", ""), to_triples(":node a pgo:Node ."))


def test_idempotency_one_property(spark):
    assert isomorphic(run(spark, ONE_PROP, ""), to_triples(ONE_PROP))


def test_idempotency_two_properties(spark):
    assert isomorphic(run(spark, TWO_PROPS, ""), to_triples(TWO_PROPS))


def test_idempotency_multi_valued(spark):
    assert isomorphic(run(spark, MULTI_VALUED, ""), to_triples(MULTI_VALUED))


def test_property_rule_on_empty_graph(spark):
    assert run(spark, "", ':knows prec:IRIOfProperty "P1" .') == []


def test_abbreviated_property_rule(spark):
    out = run(spark, ONE_PROP, ':knows prec:IRIOfProperty "P1" .')
    expected = to_triples(
        ':node a pgo:Node ; :knows [ rdf:value "v1" ; a prec:PropertyKeyValue ] .'
    )
    assert isomorphic(out, expected)


def test_pgo_property_template(spark):
    out = run(spark, ONE_PROP, PGO_PROPERTY_CTX)
    expected = to_triples("""
        :node a pgo:Node .
        :node pgo:hasProperty [ pgo:key "P1" ; pgo:value "v1" ] .
    """)
    assert isomorphic(out, expected)


def test_one_of_two_properties_rewritten(spark):
    out = run(spark, TWO_PROPS, ':loves prec:IRIOfProperty "P1" .')
    expected = to_triples("""
        :node a pgo:Node ;
          :loves [ rdf:value "v1" ; a prec:PropertyKeyValue ] ;
          :p2    [ rdf:value "v2" ; a prec:PropertyKeyValue ] .
        :p2 a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "P2" .
    """)
    assert isomorphic(out, expected)


def test_non_abbreviated_property_rule(spark):
    ctx = """
    [] a prec:PropertyRule ;
      prec:propertyIRI :knows ;
      prec:propertyKey "P1" .
    """
    out = run(spark, TWO_PROPS, ctx)
    expected = to_triples("""
        :node a pgo:Node ;
          :knows [ rdf:value "v1" ; a prec:PropertyKeyValue ] ;
          :p2    [ rdf:value "v2" ; a prec:PropertyKeyValue ] .
        :p2 a prec:PropertyKey, prec:CreatedPropertyKey ; rdfs:label "P2" .
    """)
    assert isomorphic(out, expected)


def test_two_properties_pgo_template(spark):
    out = run(spark, TWO_PROPS, PGO_PROPERTY_CTX)
    expected = to_triples("""
        :node a pgo:Node .
        :node pgo:hasProperty _:prop1 .
        _:prop1 pgo:key "P1" ; pgo:value "v1" .
        :node pgo:hasProperty _:prop2 .
        _:prop2 pgo:key "P2" ; pgo:value "v2" .
    """)
    assert isomorphic(out, expected)


def test_multi_valued_property_all_values_rewritten(spark):
    out = run(spark, MULTI_VALUED, ':talks prec:IRIOfProperty "P1" .')
    expected = to_triples("""
        :node a pgo:Node ;
          :talks [ rdf:value "v1" ; a prec:PropertyKeyValue ] ;
          :talks [ rdf:value "v2" ; a prec:PropertyKeyValue ] .
    """)
    assert isomorphic(out, expected)
