"""Blank-node isomorphism oracle tests."""

from prec_spark.rdf.isomorphism import isomorphic, triples_to_quads
from prec_spark.rdf.turtle import parse_turtle


def g(ttl: str):
    return [
        ( q.s.nt(), q.p.nt(), q.o.nt())
        for q in parse_turtle("@prefix ex: <http://e/> .\n" + ttl)
    ]


def test_identical():
    a = g("ex:a ex:p ex:b .")
    assert isomorphic(a, a)


def test_renamed_bnodes():
    a = g("_:x ex:p ex:b . _:x ex:q _:y .")
    b = g("_:u ex:p ex:b . _:u ex:q _:v .")
    assert isomorphic(a, b)


def test_not_isomorphic_structure():
    a = g("_:x ex:p _:x .")
    b = g("_:x ex:p _:y .")
    assert not isomorphic(a, b)


def test_different_sizes():
    assert not isomorphic(g("ex:a ex:p ex:b ."), g("ex:a ex:p ex:b . ex:a ex:q ex:c ."))


def test_crossed_pairs():
    a = g("_:x ex:p _:y . _:y ex:p _:x .")
    b = g("_:u ex:p _:v . _:v ex:p _:u .")
    assert isomorphic(a, b)


def test_nested_quads():
    a = g("<< _:x ex:p ex:o >> ex:q _:x .")
    b = g("<< _:z ex:p ex:o >> ex:q _:z .")
    assert isomorphic(a, b)
    c = g("<< _:z ex:p ex:o >> ex:q _:w .")
    assert not isomorphic(a, c)


def test_literal_mismatch():
    assert not isomorphic(g('_:x ex:p "a" .'), g('_:x ex:p "b" .'))
