"""Turtle/TriG-star parser unit tests (driver-side, no Spark)."""

from prec_spark.rdf.terms import (
    RDF_NS,
    XSD_BOOLEAN,
    XSD_INTEGER,
    XSD_STRING,
    BlankNode,
    Literal,
    NamedNode,
    Quad,
    parse_term,
)
from prec_spark.rdf.turtle import parse_turtle


def test_basic_triple():
    quads = parse_turtle("<http://a> <http://b> <http://c> .")
    assert quads == [
        Quad(NamedNode("http://a"), NamedNode("http://b"), NamedNode("http://c"),
             NamedNode(""))
    ]


def test_prefixes_and_a():
    quads = parse_turtle("@prefix ex: <http://e/> . ex:s a ex:T .")
    assert quads[0].s == NamedNode("http://e/s")
    assert quads[0].p == NamedNode(RDF_NS + "type")
    assert quads[0].o == NamedNode("http://e/T")


def test_sparql_style_prefix():
    quads = parse_turtle("PREFIX ex: <http://e/>\nex:s ex:p ex:o .")
    assert len(quads) == 1


def test_predicate_object_lists():
    quads = parse_turtle(
        "@prefix ex: <http://e/> . ex:s ex:p ex:o1, ex:o2 ; ex:q ex:o3 ."
    )
    assert len(quads) == 3
    assert {q.o.value for q in quads} == {"http://e/o1", "http://e/o2", "http://e/o3"}


def test_literals():
    quads = parse_turtle(
        '@prefix ex: <http://e/> . ex:s ex:p "plain", "typed"^^ex:dt, "fr"@fr, 12, 4.5, true .'
    )
    objs = [q.o for q in quads]
    assert objs[0] == Literal("plain")
    assert objs[1] == Literal("typed", "http://e/dt")
    assert objs[2] == Literal("fr", XSD_STRING, "fr")
    assert objs[3] == Literal("12", XSD_INTEGER)
    assert objs[4].datatype.endswith("double")
    assert objs[5] == Literal("true", XSD_BOOLEAN)


def test_quoted_triple():
    quads = parse_turtle(
        "@prefix ex: <http://e/> . ex:r ex:produces << ex:a ex:b ex:c >> ."
    )
    assert isinstance(quads[0].o, Quad)
    assert quads[0].o.p == NamedNode("http://e/b")


def test_nested_quoted_triple():
    quads = parse_turtle(
        "@prefix ex: <http://e/> . ex:r ex:p << << ex:a ex:b ex:c >> ex:d ex:e >> ."
    )
    inner = quads[0].o
    assert isinstance(inner.s, Quad)


def test_anonymous_bnode_with_props():
    quads = parse_turtle(
        "@prefix ex: <http://e/> . [] a ex:Rule ; ex:label \"L\" ."
    )
    assert len(quads) == 2
    assert isinstance(quads[0].s, BlankNode)
    assert quads[0].s == quads[1].s


def test_named_graph_block():
    quads = parse_turtle(
        "@prefix ex: <http://e/> . _:g { ex:a ex:b ex:c . ex:d ex:e ex:f . }"
    )
    assert len(quads) == 2
    assert all(q.g == BlankNode("g") for q in quads)


def test_collection():
    quads = parse_turtle("@prefix ex: <http://e/> . ex:s ex:p (1 2) .")
    firsts = [q for q in quads if q.p.value == RDF_NS + "first"]
    assert len(firsts) == 2


def test_escapes_roundtrip():
    quads = parse_turtle(r'<http://s> <http://p> "a\"b\nc" .')
    lit = quads[0].o
    assert lit.value == 'a"b\nc'
    assert parse_term(lit.nt()) == lit


def test_term_string_roundtrip():
    for text in [
        "<http://a/b#c>",
        "_:b1",
        '"hello"',
        '"5"^^<http://www.w3.org/2001/XMLSchema#integer>',
        '"fr"@fr',
        '<< _:e <http://p> "v" >>',
        '<< << _:a <http://p> _:b >> <http://q> "x"^^<http://dt> >>',
    ]:
        assert parse_term(text).nt() == text


def test_full_reference_corpus_parses():
    import pathlib

    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        return
    files = list((ref / "test").rglob("*.ttl")) + list((ref / "data").rglob("*.ttl"))
    assert files, "reference corpus missing"
    for f in files:
        parse_turtle(f.read_text())
