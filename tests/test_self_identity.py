"""Implicit self-identity deduction unit tests (driver-side; from
/root/reference/test/prec_impl/prec-c-template-deducing.test.ts:114-214
and context-loader.ts:370-385)."""

from prec_spark.precc.context import (
    EDGE_DOMAIN,
    PROPERTY_DOMAIN,
    PreccContext,
    _implicit_self_identity,
    pvar,
)
from prec_spark.rdf.terms import NamedNode, Quad
from prec_spark.rdf.turtle import parse_turtle

PFX = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX pgo:  <http://ii.uwb.edu.pl/pgo#>
PREFIX rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX :     <http://t/>
"""


def tmpl(quads_ttl: str):
    quads = parse_turtle(PFX + f":t prec:produces {quads_ttl} .")
    return [q.o for q in quads if isinstance(q.o, Quad)]


def test_reification_deduces_edge():
    quads = tmpl(
        "<< pvar:edge rdf:type pgo:Edge >>, "
        "<< pvar:edge rdf:subject pvar:source >>, "
        "<< pvar:edge rdf:predicate pvar:edgeIRI >>, "
        "<< pvar:edge rdf:object pvar:destination >>"
    )
    assert _implicit_self_identity(EDGE_DOMAIN.self_identity_heuristic, quads) == [
        pvar("edge")
    ]


def test_star_unique_deduces_quoted_triple():
    quads = tmpl("<< pvar:source pvar:edgeIRI pvar:destination >>")
    got = _implicit_self_identity(EDGE_DOMAIN.self_identity_heuristic, quads)
    assert got == [Quad(pvar("source"), pvar("edgeIRI"), pvar("destination"))]


def test_prec0_property_deduces_property_node():
    quads = tmpl(
        "<< pvar:holder pvar:propertyKey pvar:propertyNode >>, "
        "<< pvar:propertyNode rdf:value pvar:propertyValue >>"
    )
    assert _implicit_self_identity(
        PROPERTY_DOMAIN.self_identity_heuristic, quads
    ) == [pvar("propertyNode")]


def test_direct_triples_deduces_holder_key_value():
    quads = tmpl("<< pvar:holder pvar:propertyKey pvar:propertyValue >>")
    got = _implicit_self_identity(PROPERTY_DOMAIN.self_identity_heuristic, quads)
    assert got == [
        Quad(pvar("holder"), pvar("propertyKey"), pvar("propertyValue"))
    ]


def test_broken_edge_has_no_identity():
    quads = tmpl(
        "<< :myGraph :hasNode pvar:source >>, "
        "<< :myGraph :hasNode pvar:destination >>, "
        "<< :myGraph :hasAnEdgeLabel pvar:edgeIRI >>"
    )
    assert _implicit_self_identity(EDGE_DOMAIN.self_identity_heuristic, quads) == []


def test_explicit_self_overrides():
    ctx = PreccContext.from_turtle(PFX + """
      prec:Edges prec:templatedBy [
        prec:selfIs :toto ;
        prec:produces << pvar:edge rdf:type pgo:Edge >>
      ] .
    """)
    base = ctx.edges.base_templates[NamedNode("http://bruy.at/prec#Edges")]
    assert base.self_is == [NamedNode("http://t/toto")]
