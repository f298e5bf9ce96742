"""Context dispatch: apply a PRSC or PREC-C context to a property graph.

Mirrors the reference's top-level applyContext
(/root/reference/src/prec/apply-context.ts:23-37): classify the context
by vocabulary (getContextType, :107-143), then run the matching
dialect. The classifier is driver-side (contexts are tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .contexts.model import PRSCCatalog
from .prec0 import prec0_quads
from .precc.apply import apply_precc
from .precc.context import PreccContext, prec
from .prsc.apply import apply_prsc
from .rdf.terms import Literal, NamedNode, Quad, Term
from .rdf.turtle import parse_turtle

#: Obsolete vocabulary rejected with a hard error BEFORE dispatch
#: (hasForbiddenTerms, apply-context.ts:55-99). The reference refuses
#: these outright even though older loader code still knows them as
#: synonyms — the throw happens first, so parity means throwing too.
_PVAR_NS = "http://bruy.at/prec-trans#"
FORBIDDEN_TERMS = frozenset(
    [
        # Relationship terminology -> use the word edge instead
        prec("RelationshipRule"), prec("RelationshipTemplate"),
        prec("Relationships"), prec("RelationshipProperties"),
        prec("IRIOfRelationshipLabel"), prec("relationshipIRI"),
        NamedNode(_PVAR_NS + "relationshipIRI"), NamedNode(_PVAR_NS + "relationship"),
        # Old type names in PRSC
        prec("prsc_node"), prec("prsc_edge"),
        prec("nodeLabel"), prec("edgeLabel"),
        prec("_valueOf"), prec("prsc_valueOf"),
        # Old PREC-C terminology
        prec("edgeIs"), prec("entityIs"),
        NamedNode(_PVAR_NS + "entity"),
        prec("SubstitutionTerm"),
        NamedNode(_PVAR_NS + "metaPropertyNode"),
    ]
)


def has_forbidden_terms(quads: list[Quad]) -> list[Term]:
    """All obsolete terms used anywhere in the context (including
    inside nested RDF-star quads and literal datatypes), in first-seen
    order. Empty list = clean context."""
    seen: dict[Term, None] = {}

    def walk(term):
        if isinstance(term, Quad):
            walk(term.s)
            walk(term.p)
            walk(term.o)
            walk(term.g)
        elif isinstance(term, NamedNode):
            if term in FORBIDDEN_TERMS:
                seen.setdefault(term, None)
        elif isinstance(term, Literal) and term.datatype is not None:
            walk(term.datatype)

    for q in quads:
        walk(q)
    return list(seen)


def check_obsolete_terms(quads: list[Quad]) -> None:
    """performObsoleteTermsCheck (apply-context.ts:42-48)."""
    bad = has_forbidden_terms(quads)
    if bad:
        as_string = ", ".join(t.nt() for t in bad)
        raise ValueError(
            "The context contains the following forbidden terms: " + as_string
        )

_PRSC_TYPES = {prec("PRSCNodeRule"), prec("PRSCEdgeRule")}
_PRECC_SUBJECTS = {
    prec("Edges"), prec("Properties"), prec("NodeProperties"),
    prec("EdgeProperties"), prec("MetaProperties"), prec("NodeLabels"),
    prec("KeepProvenance"), prec("Relationships"), prec("RelationshipProperties"),
}
_PRECC_PREDICATES = {
    prec("IRIOfEdgeLabel"), prec("IRIOfRelationshipLabel"), prec("IRIOfProperty"),
    prec("IRIOfNodeLabel"), prec("mapBlankNodesToPrefix"), prec("flagState"),
    prec("templatedBy"),
}
_PRECC_TYPES = {
    prec("EdgeRule"), prec("RelationshipRule"), prec("PropertyRule"),
    prec("NodeLabelRule"), prec("EdgeTemplate"), prec("RelationshipTemplate"),
    prec("PropertyTemplate"), prec("NodeLabelTemplate"),
}
_RDF_TYPE = NamedNode("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")


def context_type(quads: list[Quad]) -> str:
    """'prsc' | 'precc' | 'empty' | 'invalid'."""
    if not quads:
        return "empty"
    is_precc = is_prsc = False
    for q in quads:
        if q.s in _PRECC_SUBJECTS or q.p in _PRECC_PREDICATES:
            is_precc = True
        if q.p == _RDF_TYPE:
            if q.o in _PRECC_TYPES:
                is_precc = True
            if q.o in _PRSC_TYPES:
                is_prsc = True
    if is_precc and is_prsc:
        return "invalid"
    if is_precc:
        return "precc"
    if is_prsc:
        return "prsc"
    return "empty"


def apply_context(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    context_quads: list[Quad],
    strict: bool = True,
    meta: DataFrame | None = None,
) -> DataFrame:
    """PG (nodes/edges DataFrames, optional TinkerPop meta-property side
    table) + context -> triples (s, p, o)."""
    check_obsolete_terms(context_quads)
    kind = context_type(context_quads)
    if kind == "invalid":
        raise ValueError("The given context mixes PREC-C and PRSC directives")
    if kind == "prsc":
        catalog = PRSCCatalog.from_quads(context_quads)
        triples, quarantine = apply_prsc(spark, nodes, edges, catalog)
        if strict and not quarantine.isEmpty():
            bad = quarantine.limit(3).collect()
            raise ValueError(f"elements without a matching PRSC rule: {bad}")
        return triples
    quads = prec0_quads(nodes, edges, meta=meta)
    if kind == "empty":
        return quads
    return apply_precc(spark, quads, PreccContext(context_quads))


def apply_context_turtle(
    spark, nodes, edges, context_ttl: str, strict: bool = True, meta=None
):
    return apply_context(spark, nodes, edges, parse_turtle(context_ttl), strict, meta)
