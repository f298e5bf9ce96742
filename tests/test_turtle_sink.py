"""Prefixed Turtle writer (S6 completion): write -> concatenate parts
in filename order -> re-parse with our own Turtle parser -> identical
triple set. Mirrors the reference's n3-Writer-with-prefixes default
output (/root/reference/src/rdf/parsing.ts:15-23)."""

import glob
import os

from prec_spark.rdf.sink import turtle_lines, write_turtle
from prec_spark.rdf.turtle import parse_turtle

TRIPLES = [
    # prefixable IRIs
    ("<http://bruy.at/prec#CreatedNodeLabel>",
     "<http://www.w3.org/2000/01/rdf-schema#subClassOf>",
     "<http://bruy.at/prec#CreatedVocabulary>"),
    # bnode subject + literal with escapes (must NOT be compressed)
    ("_:n1", "<http://www.w3.org/2000/01/rdf-schema#label>",
     '"say \\"hi\\" <http://bruy.at/prec#fake>"'),
    # non-prefixable IRI stays absolute
    ("_:n1", "<http://example.org/p>", "<http://other.org/x>"),
    # typed literal whose datatype is prefixable
    ("_:n1", "<http://example.org/q>",
     '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    # nested RDF-star term: the nested predicate IRI must compress,
    # but the IRI-shaped text INSIDE the nested literal must not
    ('<< _:e <http://bruy.at/prec#p> "see <http://bruy.at/prec#x>" >>',
     "<http://example.org/meta>", '"m"'),
]


def _read_parts(path: str) -> str:
    parts = sorted(glob.glob(os.path.join(path, "part-*")))
    return "\n".join(open(p).read() for p in parts)


def test_turtle_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    out = str(tmp_path / "ttl")
    write_turtle(df, out)
    text = _read_parts(out)
    # header first, prefixed names used
    assert text.startswith("@prefix")
    assert "prec:CreatedNodeLabel" in text
    assert "rdfs:subClassOf" in text
    assert "<http://other.org/x>" in text  # no matching prefix -> absolute
    assert '<http://bruy.at/prec#fake>"' in text  # literal content untouched
    # nested term: predicate compressed, literal content untouched
    assert "<< _:e prec:p" in text
    assert '"see <http://bruy.at/prec#x>"' in text

    reparsed = {(q.s.nt(), q.p.nt(), q.o.nt()) for q in parse_turtle(text)}
    assert reparsed == set(TRIPLES)


def test_turtle_datatype_compression_reparses(spark):
    df = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    lines = [r.value for r in turtle_lines(df).collect()]
    typed = [l for l in lines if "^^" in l]
    assert typed and "xsd:integer" in typed[0]
