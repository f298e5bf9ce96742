"""Run the reference's ENTIRE declarative end-to-end corpus
(/root/reference/test/prec/*.ttl — prec:UnitTest nodes with a property
graph, a context, and an expected output graph) through our engine.

This is the reference's own primary test harness
(test/prec-on-apoc.test.ts) re-expressed: extract the APOC JSONL, the
context graph (named graph / inline literal / prec:relativePath, with
prec:testIsBaseOf inheritance), apply the context (auto-dispatch PRSC
vs PREC-C), compare by blank-node isomorphism.
"""

import pathlib

import pytest

from prec_spark.apply_context import apply_context
from prec_spark.pg.apoc import apoc_to_pg
from prec_spark.rdf.isomorphism import isomorphic
from prec_spark.rdf.terms import DEFAULT_GRAPH, PREC_NS, Literal, NamedNode, Quad
from prec_spark.rdf.turtle import parse_turtle

CORPUS_DIR = pathlib.Path("/root/reference/test/prec")

prec = lambda s: NamedNode(PREC_NS + s)  # noqa: E731
RELATIVE_PATH = PREC_NS + "relativePath"


def _follow(quads, s, p):
    vals = [q.o for q in quads if q.s == s and q.p == p and q.g == DEFAULT_GRAPH]
    return vals[0] if len(vals) == 1 else None


def _graph_quads(quads, term):
    """extractGraph (prec-on-apoc.test.ts:16-47)."""
    if isinstance(term, Literal):
        if term.datatype == RELATIVE_PATH:
            text = (CORPUS_DIR / term.value).read_text()
        else:
            text = term.value
        return [Quad(q.s, q.p, q.o, DEFAULT_GRAPH) for q in parse_turtle(text)]
    out = [Quad(q.s, q.p, q.o, DEFAULT_GRAPH) for q in quads if q.g == term]
    for q in quads:
        if q.p == prec("testIsBaseOf") and q.o == term and q.g == DEFAULT_GRAPH:
            out.extend(_graph_quads(quads, q.s))
    return out


def _content(quads, term):
    """getContent (prec-on-apoc.test.ts:49-60)."""
    while not isinstance(term, Literal):
        term = _follow(quads, term, prec("testContent"))
        assert term is not None, "malformed test"
    if term.datatype == RELATIVE_PATH:
        return (CORPUS_DIR / term.value).read_text()
    return term.value


def _collect_cases():
    cases = []
    for f in sorted(CORPUS_DIR.glob("*.ttl")):
        quads = parse_turtle(f.read_text())
        for q in quads:
            if (
                q.p == NamedNode("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
                and q.o == prec("UnitTest")
                and q.g == DEFAULT_GRAPH
            ):
                node = q.s
                ctx = _follow(quads, node, prec("context"))
                out = _follow(quads, node, prec("output"))
                pg = _follow(quads, node, prec("propertyGraph"))
                if ctx is None or out is None or pg is None:
                    continue
                label = f"{f.stem}::{getattr(ctx, 'value', ctx)}"
                cases.append(pytest.param(f.name, node, id=label))
    return cases


CASES = _collect_cases()
_FILE_CACHE: dict = {}


def _quads_of(fname):
    if fname not in _FILE_CACHE:
        _FILE_CACHE[fname] = parse_turtle((CORPUS_DIR / fname).read_text())
    return _FILE_CACHE[fname]


@pytest.mark.parametrize("fname,node", CASES)
def test_reference_unit_corpus(spark, fname, node):
    quads = _quads_of(fname)
    ctx_term = _follow(quads, node, prec("context"))
    out_term = _follow(quads, node, prec("output"))
    pg_term = _follow(quads, node, prec("propertyGraph"))

    pg_jsonl = _content(quads, pg_term)
    # inline JSONL may be indented; relativePath contents are plain files
    if not pg_jsonl.lstrip().startswith("{") and not pg_jsonl.strip():
        pytest.skip("empty property graph")
    context_quads = _graph_quads(quads, ctx_term)
    expected = [(q.s.nt(), q.p.nt(), q.o.nt()) for q in _graph_quads(quads, out_term)]

    nodes, edges = apoc_to_pg(spark, pg_jsonl.strip())
    triples = apply_context(spark, nodes, edges, context_quads)
    rows = [(r.s, r.p, r.o) for r in triples.collect()]
    assert isomorphic(rows, expected), (
        f"{fname} {getattr(ctx_term, 'value', ctx_term)}: got {len(rows)} triples, "
        f"expected {len(expected)}"
    )
