"""Run the reference's own declarative validity / well-behaved corpora
(/root/reference/test/prsc_rules-validity.ttl and WellBehavedCheck.ttl)
against our context compiler. Driver-side only — no Spark."""

import pathlib

import pytest

from prec_spark.contexts.model import (
    PRSCCatalog,
    _build_rule,
)
from prec_spark.contexts.quadset import QuadSet
from prec_spark.rdf.terms import DEFAULT_GRAPH, PREC_NS, XSD_BOOLEAN, Literal, NamedNode
from prec_spark.rdf.turtle import parse_turtle

REF = pathlib.Path("/root/reference/test")

prec = lambda s: NamedNode(PREC_NS + s)  # noqa: E731


def _bool(term) -> bool | None:
    if isinstance(term, Literal) and term.datatype == XSD_BOOLEAN:
        return term.value in ("true", "1")
    return None


def _validity_cases():
    quads = parse_turtle((REF / "prsc_rules-validity.ttl").read_text())
    ds = QuadSet(quads)
    return [
        (q.s, _bool(q.o))
        for q in ds.match(p=prec("is_valid_template"), g=DEFAULT_GRAPH)
        if _bool(q.o) is not None
    ], ds


VALIDITY, VALIDITY_DS = _validity_cases()


@pytest.mark.parametrize("subject,expected", VALIDITY, ids=[s.value for s, _ in VALIDITY])
def test_rule_validity(subject, expected):
    rule, violations = _build_rule(VALIDITY_DS, subject)
    if expected:
        assert rule is not None, f"{subject.nt()} should be valid: {violations}"
    else:
        assert rule is None, f"{subject.nt()} should be invalid"


def _wb_graphs():
    quads = parse_turtle((REF / "WellBehavedCheck.ttl").read_text())
    by_graph: dict = {}
    for q in quads:
        if q.g == DEFAULT_GRAPH:
            continue
        by_graph.setdefault(q.g, []).append(q)
    return by_graph


ASSERTION_PREDS = {
    prec("element_identification"),
    prec("no_value_loss"),
    prec("all_signed"),
    prec("well_behaved"),
}


@pytest.mark.parametrize("graph_name", sorted(_wb_graphs(), key=lambda g: g.value))
def test_well_behaved_corpus(graph_name):
    from prec_spark.rdf.terms import Quad

    quads = _wb_graphs()[graph_name]
    context_quads = [
        Quad(q.s, q.p, q.o, DEFAULT_GRAPH) for q in quads if q.p not in ASSERTION_PREDS
    ]
    catalog = PRSCCatalog.from_quads(context_quads)
    rules = {r.identity: r for r in catalog.rules}

    # prec:all_signed markers may carry both a boolean and the subset of
    # rule identities it applies to (WellBehavedCheck.test.ts:160-238)
    all_signed_cases: dict = {}
    checked = 0
    for q in quads:
        if q.p not in ASSERTION_PREDS:
            continue
        expected = _bool(q.o)
        if q.p == prec("element_identification") and expected is not None:
            got = catalog.element_identification(rules[q.s]) == "full"
            assert got == expected, f"{q.s.nt()} element_identification"
            checked += 1
        elif q.p == prec("no_value_loss") and expected is not None:
            assert catalog.no_value_loss(rules[q.s]) == expected, f"{q.s.nt()} no_value_loss"
            checked += 1
        elif q.p == prec("well_behaved") and expected is not None:
            assert catalog.well_behaved() == expected, f"{graph_name.nt()} well_behaved"
            checked += 1
        elif q.p == prec("all_signed"):
            case = all_signed_cases.setdefault(q.s, {"expected": None, "rules": []})
            if expected is not None:
                case["expected"] = expected
            else:
                case["rules"].append(q.o)

    for marker, case in all_signed_cases.items():
        if case["expected"] is None:
            continue
        if marker == NamedNode(PREC_NS + "name=all"):
            subset = list(catalog.rules)  # this:all -> the whole graph
        else:
            subset = [rules[i] for i in case["rules"]]  # possibly empty
        sub = PRSCCatalog(subset)
        assert sub.all_signed() == case["expected"], (
            f"{graph_name.nt()} all_signed for {marker.nt()}"
        )
        checked += 1
    assert checked > 0, f"no assertions found in {graph_name.nt()}"
