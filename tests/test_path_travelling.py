"""F9 path/shape checks — QuadSet parity with the reference's
src/rdf/path-travelling.ts (hasNamedGraph, isRdfStar, getPathsFrom,
followOrNull, hasExpectedPaths, checkAndFollow,
extractAndDeleteRdfList). Driver-side: these walk CONTEXT graphs
(tens of quads), never data graphs."""

import pytest

from prec_spark.contexts.quadset import QuadSet
from prec_spark.rdf.terms import (
    DEFAULT_GRAPH,
    RDF_NS,
    BlankNode,
    Literal,
    NamedNode,
)
from prec_spark.rdf.terms import Quad as RawQuad

EX = "http://ex/"


def n(x):
    return NamedNode(EX + x)


def Quad(s, p, o, g=DEFAULT_GRAPH):
    """Top-level quad: default graph explicit (RawQuad defaults g=None,
    the nested-term construction form)."""
    return RawQuad(s, p, o, g)


FIRST, REST = NamedNode(RDF_NS + "first"), NamedNode(RDF_NS + "rest")
NIL = NamedNode(RDF_NS + "nil")


def test_has_named_graph_and_rdf_star():
    plain = QuadSet([Quad(n("s"), n("p"), n("o"))])
    assert not plain.has_named_graph() and not plain.is_rdf_star()
    g = QuadSet([Quad(n("s"), n("p"), n("o"), n("g"))])
    assert g.has_named_graph()
    star = QuadSet([Quad(RawQuad(n("a"), n("b"), n("c")), n("p"), Literal("x"))])
    assert star.is_rdf_star()


def test_get_paths_from_ignores():
    qs = QuadSet(
        [
            Quad(n("s"), n("p1"), n("o1")),
            Quad(n("s"), n("p2"), n("o2")),
            # named graph: INCLUDED — the reference's dataset.match(subject)
            # leaves the graph position a wildcard (path-travelling.ts:77-80)
            Quad(n("s"), n("p1"), n("o3"), n("g")),
            Quad(n("t"), n("p1"), n("o4")),
        ]
    )
    got = qs.get_paths_from(n("s"), ignore=[n("p2")])
    assert [(q.p, q.o) for q in got] == [(n("p1"), n("o1")), (n("p1"), n("o3"))]


def test_follow_or_null():
    qs = QuadSet([Quad(n("s"), n("p"), n("o"))])
    assert qs.follow_or_null(n("s"), n("p")) == n("o")
    assert qs.follow_or_null(n("s"), n("q")) is None
    qs.add(Quad(n("s"), n("p"), n("o2")))
    with pytest.raises(ValueError, match="at most one"):
        qs.follow_or_null(n("s"), n("p"))


def test_has_expected_paths():
    qs = QuadSet(
        [
            Quad(n("s"), n("a"), n("x")),
            Quad(n("s"), n("b"), n("y")),
        ]
    )
    # exact required set, object wildcard allowed
    assert qs.has_expected_paths(n("s"), [(n("a"), n("x")), (n("b"), None)], [])
    # an unexpected extra path -> False
    qs.add(Quad(n("s"), n("c"), n("z")))
    assert qs.has_expected_paths(n("s"), [(n("a"), n("x")), (n("b"), None)], []) is False
    # allowed as optional -> True
    assert qs.has_expected_paths(
        n("s"), [(n("a"), n("x")), (n("b"), None)], [(n("c"), None)]
    )
    # fewer actual paths than required -> None (the reference's early null)
    assert qs.has_expected_paths(n("t"), [(n("a"), n("x"))], []) is None


def test_check_and_follow():
    qs = QuadSet(
        [
            Quad(n("s"), n("follow"), n("target")),
            Quad(n("s"), n("req"), n("r")),
        ]
    )
    assert qs.check_and_follow(n("s"), n("follow"), [(n("req"), n("r"))], []) == n(
        "target"
    )
    # extra unspecified path kills it
    qs.add(Quad(n("s"), n("other"), n("x")))
    assert qs.check_and_follow(n("s"), n("follow"), [(n("req"), n("r"))], []) is None
    # ...unless declared optional
    assert qs.check_and_follow(
        n("s"), n("follow"), [(n("req"), n("r"))], [(n("other"), n("x"))]
    ) == n("target")


def _list_quads(head, items):
    node = head
    out = []
    for i, item in enumerate(items):
        nxt = NIL if i == len(items) - 1 else BlankNode(f"l{i + 1}")
        out.append(Quad(node, FIRST, item))
        out.append(Quad(node, REST, nxt))
        node = nxt
    return out


def test_extract_and_delete_rdf_list():
    head = BlankNode("l0")
    items = [Literal("a"), Literal("b"), Literal("c")]
    qs = QuadSet(_list_quads(head, items) + [Quad(n("s"), n("vals"), head)])
    # the head reference from n(s) is the single allowed incoming... the
    # reference demands NO incoming on the head within the walk; drop it
    qs2 = QuadSet(_list_quads(head, items))
    assert qs2.extract_and_delete_rdf_list(head) == items
    assert len(qs2) == 0  # list quads removed

    # malformed: node with a dangling extra edge
    qs3 = QuadSet(_list_quads(head, items) + [Quad(head, n("extra"), n("x"))])
    with pytest.raises(ValueError, match="invalid RDF list"):
        qs3.extract_and_delete_rdf_list(head)


def test_extract_rdf_list_typed_nodes():
    """A node annotated `rdf:type rdf:List` is valid (3 outgoing) and the
    type triple is deleted with the list (path-travelling.ts:258-276)."""
    rdf_type, rdf_list = NamedNode(RDF_NS + "type"), NamedNode(RDF_NS + "List")
    head = BlankNode("l0")
    items = [Literal("a"), Literal("b")]
    qs = QuadSet(_list_quads(head, items) + [Quad(head, rdf_type, rdf_list)])
    assert qs.extract_and_delete_rdf_list(head) == items
    assert len(qs) == 0  # the rdf:type triple is removed too

    # the type triple alone does NOT excuse a missing first/rest
    qs2 = QuadSet(
        [
            Quad(head, rdf_type, rdf_list),
            Quad(head, FIRST, Literal("a")),
            # no rdf:rest
        ]
    )
    with pytest.raises(ValueError, match="invalid RDF list"):
        qs2.extract_and_delete_rdf_list(head)


def test_extract_rdf_list_predicate_position_rejected():
    """A list node used in predicate position anywhere invalidates the
    list (path-travelling.ts:255)."""
    head = BlankNode("l0")
    items = [Literal("a")]
    qs = QuadSet(_list_quads(head, items) + [Quad(n("x"), head, n("y"))])
    with pytest.raises(ValueError, match="invalid RDF list"):
        qs.extract_and_delete_rdf_list(head)
