"""A tiny driver-side quad container with pattern matching.

Plays the role the reference's DStar plays for *context* graphs only
(/root/reference/src/dataset/index.ts) — data graphs live in Spark
DataFrames, never here. Linear scans are fine: contexts are tens of
quads.
"""

from __future__ import annotations

from collections.abc import Iterable

from ..rdf.terms import DEFAULT_GRAPH, Quad, Term


class QuadSet:
    def __init__(self, quads: Iterable[Quad] = ()):
        self.quads: list[Quad] = []
        self._seen: set[Quad] = set()
        for q in quads:
            self.add(q)

    def add(self, q: Quad):
        if q not in self._seen:
            self._seen.add(q)
            self.quads.append(q)

    def match(self, s=None, p=None, o=None, g=None) -> list[Quad]:
        out = []
        for q in self.quads:
            if s is not None and q.s != s:
                continue
            if p is not None and q.p != p:
                continue
            if o is not None and q.o != o:
                continue
            if g is not None and q.g != g:
                continue
            out.append(q)
        return out

    def follow_all(self, s: Term, p: Term, g=DEFAULT_GRAPH) -> list[Term]:
        return [q.o for q in self.match(s=s, p=p, g=g)]

    def follow_through(self, s: Term, p: Term, g=DEFAULT_GRAPH) -> Term | None:
        """Unique-path lookup: the object iff exactly one match, else None
        (reference: followThrough, src/rdf/path-travelling.ts:92-97)."""
        objs = self.follow_all(s, p, g)
        return objs[0] if len(objs) == 1 else None

    def subjects_of_type(self, type_iri: Term, g=DEFAULT_GRAPH) -> list[Term]:
        from ..rdf.terms import RDF_NS, NamedNode

        return [q.s for q in self.match(p=NamedNode(RDF_NS + "type"), o=type_iri, g=g)]

    def __len__(self):
        return len(self.quads)

    def __iter__(self):
        return iter(self.quads)
