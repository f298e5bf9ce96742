"""End-to-end PRSC golden tests.

Cases re-expressed from the reference mocha suite (FIXTURES.md §4):
/root/reference/test/prec/ex2_anndan.test.ttl, ex1_potus.test.ttl and
test/prec_impl/prsc.test.ts. Oracle = blank-node isomorphism, the same
criterion the reference uses (test/utility.ts:35-59).
"""

import pytest

from prec_spark.contexts.model import PRSCCatalog, ContextViolations
from prec_spark.pg.apoc import apoc_to_pg
from prec_spark.prsc.apply import apply_prsc
from prec_spark.rdf.isomorphism import isomorphic
from prec_spark.rdf.turtle import parse_turtle

ANN_DAN_PG = """
{"type":"node","id":"9","labels":["Person"],"properties":{"name":"Ann"}}
{"type":"node","id":"10","labels":["Person"],"properties":{"name":"Dan"}}
{"id":"12","type":"relationship","label":"Likes","start":{"id":"9","labels":["Person"]},"end":{"id":"10","labels":["Person"]}}
"""

# 3 parallel Likes edges (data/ex2_annlikesdan3.json shape)
ANN_DAN3_PG = """
{"type":"node","id":"9","labels":["Person"],"properties":{"name":"Ann"}}
{"type":"node","id":"10","labels":["Person"],"properties":{"name":"Dan"}}
{"id":"12","type":"relationship","label":"Likes","start":{"id":"9","labels":["Person"]},"end":{"id":"10","labels":["Person"]}}
{"id":"13","type":"relationship","label":"Likes","start":{"id":"9","labels":["Person"]},"end":{"id":"10","labels":["Person"]}}
{"id":"14","type":"relationship","label":"Likes","start":{"id":"9","labels":["Person"]},"end":{"id":"10","labels":["Person"]}}
"""

PRSC_CTX = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX ex:   <http://example.org/>

ex:PersonForm a prec:PRSCNodeRule ;
  prec:label "Person" ;
  prec:propertyKey "name" ;
  prec:produces
    << pvar:self ex:hasLabel ex:person >> ,
    << pvar:self ex:name "name"^^prec:valueOf >> .

ex:LovesForm a prec:PRSCEdgeRule ;
  prec:label "Likes" ;
  prec:produces << pvar:source ex:loves pvar:destination >> .
"""

PRSC_WB_CTX = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX ex:   <http://example.org/>
PREFIX rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

ex:PersonForm a prec:PRSCNodeRule ;
  prec:label "Person" ;
  prec:propertyKey "name" ;
  prec:produces
    << pvar:self ex:hasLabel ex:person >> ,
    << pvar:self ex:name "name"^^prec:valueOf >> .

ex:LovesForm a prec:PRSCEdgeRule ;
  prec:label "Likes" ;
  prec:produces
    << pvar:self rdf:type ex:Like >>,
    << pvar:self ex:from pvar:source >>,
    << pvar:self ex:content_producer pvar:destination >> .
"""

POTUS_PG = """
{"type":"node","id":"1","labels":["PERSON"],"properties":{"name":"Biden","givenName": "Joseph"}}
{"type":"node","id":"2","labels":["COUNTRY"],"properties":{"name":"United States of America"}}
"""

POTUS_CTX = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX dbpedia: <http://dbpedia.org/ontology/>
PREFIX schema: <https://schema.org/>

_:PersonRule a prec:PRSCNodeRule ;
  prec:label "PERSON" ;
  prec:propertyKey "name", "givenName" ;
  prec:produces
    << pvar:self a dbpedia:Person >> ,
    << pvar:self schema:givenName "givenName"^^prec:valueOf >> ,
    << pvar:self schema:familyName "name"^^prec:valueOf >> .

_:CountryRule a prec:PRSCNodeRule ;
  prec:label "COUNTRY" ;
  prec:propertyKey "name" ;
  prec:produces
    << pvar:self a dbpedia:Country >> ,
    << pvar:self <http://example.org/countryName> "name"^^prec:valueOf >> .
"""


def golden(ttl: str):
    """Golden graph as (s, p, o) term-string triples."""
    return [(q.s.nt(), q.p.nt(), q.o.nt()) for q in parse_turtle(ttl)]


def run(spark, pg_jsonl: str, ctx: str):
    nodes, edges = apoc_to_pg(spark, pg_jsonl)
    catalog = PRSCCatalog.from_turtle(ctx)
    triples, quarantine = apply_prsc(spark, nodes, edges, catalog)
    rows = [(r.s, r.p, r.o) for r in triples.collect()]
    bad = quarantine.collect()
    return rows, bad


def test_anndan_prsc(spark):
    rows, bad = run(spark, ANN_DAN_PG, PRSC_CTX)
    assert not bad
    expected = golden("""
        @prefix ex: <http://example.org/> .
        _:ann ex:hasLabel ex:person ; ex:name "Ann" .
        _:dan ex:hasLabel ex:person ; ex:name "Dan" .
        _:ann ex:loves _:dan .
    """)
    assert isomorphic(rows, expected)


def test_anndan_prsc_well_behaved(spark):
    rows, bad = run(spark, ANN_DAN_PG, PRSC_WB_CTX)
    assert not bad
    expected = golden("""
        @prefix ex: <http://example.org/> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        _:ann ex:hasLabel ex:person ; ex:name "Ann" .
        _:dan ex:hasLabel ex:person ; ex:name "Dan" .
        _:like rdf:type ex:Like ;
          ex:from _:ann ;
          ex:content_producer _:dan .
    """)
    assert isomorphic(rows, expected)


def test_anndan3_edge_unique_collapse(spark):
    """3 parallel Likes collapse to one triple under the non-wb context
    (information loss case, ex2_anndan.test.ttl:37-42)."""
    rows, bad = run(spark, ANN_DAN3_PG, PRSC_CTX)
    assert not bad
    expected = golden("""
        @prefix ex: <http://example.org/> .
        _:ann ex:hasLabel ex:person ; ex:name "Ann" .
        _:dan ex:hasLabel ex:person ; ex:name "Dan" .
        _:ann ex:loves _:dan .
    """)
    assert isomorphic(rows, expected)


def test_anndan3_wb_keeps_three_edges(spark):
    rows, bad = run(spark, ANN_DAN3_PG, PRSC_WB_CTX)
    assert not bad
    expected = golden("""
        @prefix ex: <http://example.org/> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        _:ann ex:hasLabel ex:person ; ex:name "Ann" .
        _:dan ex:hasLabel ex:person ; ex:name "Dan" .
        _:l1 rdf:type ex:Like ; ex:from _:ann ; ex:content_producer _:dan .
        _:l2 rdf:type ex:Like ; ex:from _:ann ; ex:content_producer _:dan .
        _:l3 rdf:type ex:Like ; ex:from _:ann ; ex:content_producer _:dan .
    """)
    assert isomorphic(rows, expected)


def test_potus_prsc(spark):
    rows, bad = run(spark, POTUS_PG, POTUS_CTX)
    assert not bad
    expected = golden("""
        @prefix schema: <https://schema.org/> .
        @prefix dbpedia: <http://dbpedia.org/ontology/> .
        _:joe a dbpedia:Person ;
            schema:givenName "Joseph" ;
            schema:familyName "Biden" .
        _:usa a dbpedia:Country ;
            <http://example.org/countryName> "United States of America" .
    """)
    assert isomorphic(rows, expected)


def test_unmatched_element_quarantined(spark):
    """Reference throws on no-rule-match (PrscContext.ts:144-146); we
    quarantine instead of failing the job."""
    pg = '{"type":"node","id":"1","labels":["Ghost"],"properties":{}}'
    rows, bad = run(spark, pg, PRSC_CTX)
    assert rows == []
    assert len(bad) == 1 and bad[0].reason == "no_rule_matches"


def test_strict_property_set_match(spark):
    """Element with an extra property key must NOT match (set equality,
    PrscContext.ts:137-142 / prsc.test.ts strict cases)."""
    pg = '{"type":"node","id":"1","labels":["Person"],"properties":{"name":"Ann","age":3}}'
    rows, bad = run(spark, pg, PRSC_CTX)
    assert rows == []
    assert len(bad) == 1


def test_signatures_and_well_behaved():
    cat = PRSCCatalog.from_turtle(PRSC_WB_CTX)
    sigs = cat.signatures()
    assert len(sigs) == 2
    assert cat.well_behaved()

    cat2 = PRSCCatalog.from_turtle(PRSC_CTX)
    kinds = {s.rule_identity.value.split("/")[-1]: s.kind for s in cat2.signatures()}
    assert kinds.get("LovesForm") == "edge-unique"


def test_invalid_template_prop_name_rejected():
    ctx = """
    PREFIX prec: <http://bruy.at/prec#>
    PREFIX pvar: <http://bruy.at/prec-trans#>
    PREFIX ex:   <http://example.org/>
    ex:R a prec:PRSCNodeRule ;
      prec:label "X" ;
      prec:produces << pvar:self ex:name "missing"^^prec:valueOf >> .
    """
    with pytest.raises(ContextViolations):
        PRSCCatalog.from_turtle(ctx)


def test_node_rule_with_source_rejected():
    ctx = """
    PREFIX prec: <http://bruy.at/prec#>
    PREFIX pvar: <http://bruy.at/prec-trans#>
    PREFIX ex:   <http://example.org/>
    ex:R a prec:PRSCNodeRule ;
      prec:label "X" ;
      prec:produces << pvar:self ex:p pvar:source >> .
    """
    with pytest.raises(ContextViolations):
        PRSCCatalog.from_turtle(ctx)


# ---- additional unit cases ported from test/prec_impl/prsc.test.ts ----

def test_node_without_labels_or_properties(spark):
    pg = '{"type":"node","id":"1"}'
    ctx = """
    PREFIX prec: <http://bruy.at/prec#>
    PREFIX pvar: <http://bruy.at/prec-trans#>
    PREFIX ex: <http://test/>
    [] a prec:PRSCNodeRule ;
      prec:produces << pvar:node ex:exists ex:inthepg >> .
    """
    rows, bad = run(spark, pg, ctx)
    assert not bad
    assert isomorphic(rows, golden("@prefix ex: <http://test/> . _:n ex:exists ex:inthepg ."))


def test_rdf_star_property_on_edge(spark):
    """Nested quoted triple with valueOf ('Map the property of an edge')."""
    pg = """
{"type":"node","id":"1","labels":["person"]}
{"type":"node","id":"2","labels":["person"]}
{"type":"relationship","id":"3","label":"knows","start":{"id":"1"},"end":{"id":"2"},"properties":{"since":"yesterday"}}
"""
    ctx = """
    PREFIX prec: <http://bruy.at/prec#>
    PREFIX pvar: <http://bruy.at/prec-trans#>
    PREFIX ex: <http://test/>
    ex:person a prec:PRSCNodeRule ;
      prec:label "person" ;
      prec:produces << pvar:self a ex:Person >> .
    [] a prec:PRSCEdgeRule ;
      prec:label "knows" ;
      prec:propertyKey "since" ;
      prec:produces << pvar:source ex:knows pvar:destination >>,
        << << pvar:destination ex:isStalkedBy pvar:source >> ex:since "since"^^prec:valueOf >> .
    """
    rows, bad = run(spark, pg, ctx)
    assert not bad
    expected = golden("""
        @prefix ex: <http://test/> .
        _:toto ex:knows _:titi .
        << _:titi ex:isStalkedBy _:toto >> ex:since "yesterday" .
        _:toto a ex:Person . _:titi a ex:Person .
    """)
    assert isomorphic(rows, expected)


def test_translate_labels_with_integer_property(spark):
    pg = """
{"type":"node","id":"1","labels":["person"],"properties":{"name":"Toto"}}
{"type":"node","id":"2","labels":["knight"],"properties":{"name":"Alice","number":30}}
{"type":"relationship","id":"3","label":"knows","start":{"id":"1"},"end":{"id":"2"},"properties":{"since":"2021"}}
"""
    ctx = """
    PREFIX prec: <http://bruy.at/prec#>
    PREFIX pvar: <http://bruy.at/prec-trans#>
    PREFIX ex: <http://test/>
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    ex:PersonPGType a prec:PRSCNodeRule ;
      prec:label "person" ;
      prec:propertyKey "name" ;
      prec:produces
        << pvar:node rdf:type ex:Person >> ,
        << pvar:node ex:name "name"^^prec:valueOf >> .
    ex:KnightPGType a prec:PRSCNodeRule ;
      prec:label "knight" ;
      prec:propertyKey "name" ;
      prec:propertyKey "number" ;
      prec:produces
        << pvar:node rdf:type ex:Knight >> ,
        << pvar:node ex:name   "name"^^prec:valueOf >> ,
        << pvar:node ex:number "number"^^prec:valueOf >> .
    ex:KnowsPGEdge a prec:PRSCEdgeRule ;
      prec:label "knows" ;
      prec:propertyKey "since" ;
      prec:produces
           << pvar:source ex:knows pvar:destination >> ,
        << << pvar:source ex:knows pvar:destination >> ex:since "since"^^prec:valueOf >> .
    """
    rows, bad = run(spark, pg, ctx)
    assert not bad
    expected = golden("""
        @prefix ex: <http://test/> .
        _:toto a ex:Person ; ex:name "Toto" .
        _:alice a ex:Knight ; ex:name "Alice" ; ex:number 30 .
        _:toto ex:knows _:alice .
        << _:toto ex:knows _:alice >> ex:since "2021" .
    """)
    assert isomorphic(rows, expected)


def test_two_labels_set_match(spark):
    pg = '{"type":"node","id":"1","labels":["Letter","Vowel"],"properties":{"value":"A"}}'
    ctx = """
    PREFIX prec: <http://bruy.at/prec#>
    PREFIX pvar: <http://bruy.at/prec-trans#>
    PREFIX ex: <http://test/>
    [] a prec:PRSCNodeRule ;
      prec:label "Letter", "Vowel" ;
      prec:propertyKey "value" ;
      prec:produces << pvar:node ex:isTheLetter "value"^^prec:valueOf >> .
    """
    rows, bad = run(spark, pg, ctx)
    assert not bad
    assert isomorphic(rows, golden('@prefix ex: <http://test/> . _:a ex:isTheLetter "A" .'))


def test_template_blank_node_fresh_per_element(spark):
    """A blank node in the template is instantiated fresh per element
    (buildRdfTriplesFromRule, PrscContext.ts:205-212)."""
    pg = """
{"type":"node","id":"1","labels":["L"],"properties":{"v":"x"}}
{"type":"node","id":"2","labels":["L"],"properties":{"v":"y"}}
"""
    ctx = """
    PREFIX prec: <http://bruy.at/prec#>
    PREFIX pvar: <http://bruy.at/prec-trans#>
    PREFIX ex: <http://test/>
    [] a prec:PRSCNodeRule ;
      prec:label "L" ;
      prec:propertyKey "v" ;
      prec:produces << pvar:node ex:hasProp _:pv >>,
        << _:pv ex:value "v"^^prec:valueOf >> .
    """
    rows, bad = run(spark, pg, ctx)
    assert not bad
    expected = golden("""
        @prefix ex: <http://test/> .
        _:n1 ex:hasProp _:pv1 . _:pv1 ex:value "x" .
        _:n2 ex:hasProp _:pv2 . _:pv2 ex:value "y" .
    """)
    assert isomorphic(rows, expected)


def test_named_graph_template_form(spark):
    """Templates may be given as named graphs instead of quoted triples
    (readTemplate, PrscRule.ts:138-152)."""
    pg = '{"type":"node","id":"1","labels":["Person"],"properties":{"name":"Ann"}}'
    ctx = """
    PREFIX prec: <http://bruy.at/prec#>
    PREFIX pvar: <http://bruy.at/prec-trans#>
    PREFIX ex:   <http://example.org/>
    ex:PersonForm a prec:PRSCNodeRule ;
      prec:label "Person" ;
      prec:propertyKey "name" ;
      prec:produces ex:tpl .
    ex:tpl {
      pvar:self ex:hasLabel ex:person .
      pvar:self ex:name "name"^^prec:valueOf .
    }
    """
    rows, bad = run(spark, pg, ctx)
    assert not bad
    expected = golden("""
        @prefix ex: <http://example.org/> .
        _:ann ex:hasLabel ex:person ; ex:name "Ann" .
    """)
    assert isomorphic(rows, expected)
