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

    # ---- F9 path/shape checks (src/rdf/path-travelling.ts) ----------

    def has_named_graph(self) -> bool:
        """hasNamedGraph (path-travelling.ts:20-29). Quad.g of None
        (nested-term construction default) counts as the default graph."""
        return any(q.g is not None and q.g != DEFAULT_GRAPH for q in self.quads)

    def is_rdf_star(self) -> bool:
        """isRdfStar (path-travelling.ts:31-42): any quad with a nested
        quad in subject or object position."""
        return any(isinstance(q.s, Quad) or isinstance(q.o, Quad) for q in self.quads)

    def get_paths_from(self, s: Term, ignore: Iterable[Term] = ()) -> list[Quad]:
        """getPathsFrom (path-travelling.ts:77-80): quads from `s` in ANY
        graph (the reference's dataset.match(subject) leaves the graph
        position a wildcard) whose predicate is not in the ignore list."""
        skip = set(ignore)
        return [q for q in self.match(s=s) if q.p not in skip]

    def follow_or_null(self, s: Term, p: Term) -> Term | None:
        """followOrNull (path-travelling.ts:109-124): the unique object,
        None when absent — but raises when the path is NOT unique."""
        objs = self.follow_all(s, p)
        if len(objs) > 1:
            raise ValueError(f"expected at most one {p.nt()} on {s.nt()}")
        return objs[0] if objs else None

    def has_expected_paths(
        self,
        s: Term,
        required: list[tuple[Term, Term | None]],
        optional: list[tuple[Term, Term | None]],
    ) -> bool | None:
        """hasExpectedPaths (path-travelling.ts:157-197): every
        default-graph quad from `s` must consume one required or
        optional (predicate, object-or-wildcard) path; all required
        paths must be consumed. None mirrors the reference's early
        size-based null."""
        match = self.match(s=s, g=DEFAULT_GRAPH)
        if len(match) < len(required):
            return None
        req, opt = list(required), list(optional)

        def consume(q: Quad, paths: list) -> bool:
            for i, (p, o) in enumerate(paths):
                if q.p == p and (o is None or q.o == o):
                    paths.pop(i)
                    return True
            return False

        for q in match:
            if not consume(q, req) and not consume(q, opt):
                return False
        return not req

    def check_and_follow(
        self,
        s: Term,
        p: Term,
        required: list[tuple[Term, Term]],
        optional: list[tuple[Term, Term]],
    ) -> Term | None:
        """checkAndFollow (path-travelling.ts:217-236): the object of
        the unique (s, p) path iff the subject's paths are exactly the
        followed path + required + optional."""
        followed = self.follow_through(s, p)
        if followed is None:
            return None
        ok = self.has_expected_paths(s, [(p, followed), *required], list(optional))
        return followed if ok else None

    def extract_and_delete_rdf_list(self, head: Term) -> list[Term]:
        """extractAndDeleteRdfList (path-travelling.ts:246-289): walk a
        well-formed rdf:first/rdf:rest chain from `head`, REMOVE its
        quads, return the items; raise on malformed or externally
        connected list nodes."""
        from ..rdf.terms import RDF_NS, NamedNode

        first, rest = NamedNode(RDF_NS + "first"), NamedNode(RDF_NS + "rest")
        nil = NamedNode(RDF_NS + "nil")
        rdf_type = NamedNode(RDF_NS + "type")
        rdf_list = NamedNode(RDF_NS + "List")
        items: list[Term] = []
        node = head
        to_remove: list[Quad] = []
        while node != nil:
            outgoing = self.match(s=node, g=DEFAULT_GRAPH)
            incoming = self.match(o=node, g=DEFAULT_GRAPH)
            # the reference also rejects a list node used in predicate
            # position anywhere (path-travelling.ts:255)
            if self.match(p=node):
                raise ValueError(f"invalid RDF list node {node.nt()}")
            # a node may carry an explicit `rdf:type rdf:List` triple:
            # 3 outgoing with it, 2 without (path-travelling.ts:258-262)
            is_list = any(
                q.p == rdf_type and q.o == rdf_list for q in outgoing
            )
            expected_out = 3 if is_list else 2
            expected_in = 0 if node == head else 1
            if len(incoming) != expected_in or len(outgoing) != expected_out:
                raise ValueError(f"invalid RDF list node {node.nt()}")
            f = self.follow_through(node, first)
            r = self.follow_through(node, rest)
            if f is None or r is None:
                raise ValueError(f"invalid RDF list node {node.nt()}")
            items.append(f)
            to_remove.extend(outgoing)
            node = r
        for q in to_remove:
            self._seen.discard(q)
            self.quads.remove(q)
        return items

    def __len__(self):
        return len(self.quads)

    def __iter__(self):
        return iter(self.quads)
