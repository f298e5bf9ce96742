"""Template-pattern compilation: the generative core of the engine.

Both PRSC and PREC-C materialize triples by instantiating template
graphs per element (SURVEY.md §2.8). We compile each template term
driver-side into a *pattern string* with NUL-delimited placeholders;
distributed instantiation is then a chain of JVM `replace()` column
expressions — no UDFs, fully inside whole-stage codegen, one pass.

This replaces the reference's per-element term-tree rewriting
(eventuallyRebuildQuad, /root/reference/src/rdf/quad-star.ts:23-38;
remapPatternWithVariables quad-star.ts:48-68) with a vectorized
equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rdf.terms import Quad, Term


def placeholder(name: str) -> str:
    """A NUL-delimited placeholder (NUL never occurs in encoded terms)."""
    return f"\x00{name}\x00"


def compile_term(term: Term, mapping: dict[Term, str], literal_mapper=None) -> str:
    """Serialize a template term, replacing mapped terms by placeholders.

    mapping: template term -> placeholder name.
    literal_mapper: optional fn(Literal) -> placeholder name | None, for
    value-of style datatype-driven placeholders.
    """
    if term in mapping:
        return placeholder(mapping[term])
    if literal_mapper is not None:
        ph = literal_mapper(term)
        if ph is not None:
            return placeholder(ph)
    if isinstance(term, Quad):
        s = compile_term(term.s, mapping, literal_mapper)
        p = compile_term(term.p, mapping, literal_mapper)
        o = compile_term(term.o, mapping, literal_mapper)
        return f"<< {s} {p} {o} >>"
    return term.nt()


def substitute(col: Column, bindings: dict[str, Column]) -> Column:
    """Chained replace() instantiating every placeholder in a pattern."""
    for name, value in bindings.items():
        col = F.replace(col, F.lit(placeholder(name)), value)
    return col


def pattern_uses(pattern_cols: list[str], name: str) -> bool:
    """Does any compiled pattern string reference the placeholder?"""
    ph = placeholder(name)
    return any(ph in p for p in pattern_cols)
