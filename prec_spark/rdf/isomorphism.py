"""Blank-node isomorphism check — the correctness oracle for golden tests.

The reference's test suite compares produced vs expected graphs with
`rdf-isomorphic` (/root/reference/test/utility.ts:35-59): two graphs are
equal iff a bijection between their blank nodes makes the quad sets
equal. Our graphs are term-string triples; we parse them back into
Terms and run a small backtracking search with signature pruning —
test graphs are tiny (<100 triples), this is driver-side test-only
code (at scale, correctness uses deterministic canonical ids instead,
SURVEY.md §5).
"""

from __future__ import annotations

from collections import Counter

from .terms import BlankNode, Quad, Term, parse_term


def triples_to_quads(triples) -> list[Quad]:
    """(s, p, o) term-string tuples -> Quad objects."""
    return [
        Quad(parse_term(s), parse_term(p), parse_term(o)) for (s, p, o) in triples
    ]


def _walk(term: Term):
    yield term
    if isinstance(term, Quad):
        for t in term.terms():
            yield from _walk(t)


def _bnodes_of(quads: list[Quad]) -> list[BlankNode]:
    seen, out = set(), []
    for q in quads:
        for t in _walk(q):
            if isinstance(t, BlankNode) and t not in seen:
                seen.add(t)
                out.append(t)
    return out


def _skeleton(term: Term) -> Term:
    if isinstance(term, BlankNode):
        return BlankNode("")
    if isinstance(term, Quad):
        return Quad(_skeleton(term.s), _skeleton(term.p), _skeleton(term.o))
    return term


def _apply_mapping(term: Term, mapping: dict[BlankNode, BlankNode]) -> Term:
    if isinstance(term, BlankNode):
        return mapping.get(term, term)
    if isinstance(term, Quad):
        return Quad(
            _apply_mapping(term.s, mapping),
            _apply_mapping(term.p, mapping),
            _apply_mapping(term.o, mapping),
        )
    return term


def _signature(bn: BlankNode, quads: list[Quad]) -> Counter:
    """Local structural signature: multiset of skeletonized quads the
    bnode participates in, tagged with its position path."""
    sig: Counter = Counter()

    def paths(term: Term, prefix: str):
        if term == bn:
            yield prefix
        if isinstance(term, Quad):
            yield from paths(term.s, prefix + "s")
            yield from paths(term.p, prefix + "p")
            yield from paths(term.o, prefix + "o")

    for q in quads:
        for path in paths(q, ""):
            sig[(path, _skeleton(q))] += 1
    return sig


def isomorphic(a, b) -> bool:
    """True iff triple sets a and b are equal up to blank-node renaming."""
    qa = triples_to_quads(a) if a and isinstance(a[0], tuple) else list(a)
    qb = triples_to_quads(b) if b and isinstance(b[0], tuple) else list(b)
    set_a, set_b = set(qa), set(qb)
    if len(set_a) != len(set_b):
        return False
    if Counter(_skeleton(q) for q in set_a) != Counter(_skeleton(q) for q in set_b):
        return False

    bns_a, bns_b = _bnodes_of(qa), _bnodes_of(qb)
    if len(bns_a) != len(bns_b):
        return False

    sigs_a = {bn: _signature(bn, qa) for bn in bns_a}
    sigs_b = {bn: _signature(bn, qb) for bn in bns_b}

    # candidates: bnodes in b with identical signature
    candidates = {
        bn: [b2 for b2 in bns_b if sigs_b[b2] == sigs_a[bn]] for bn in bns_a
    }
    if any(not c for c in candidates.values()):
        return False

    order = sorted(bns_a, key=lambda bn: len(candidates[bn]))

    def backtrack(i: int, mapping: dict, used: set) -> bool:
        if i == len(order):
            mapped = {_apply_mapping(q, mapping) for q in set_a}
            return mapped == set_b
        bn = order[i]
        for cand in candidates[bn]:
            if cand in used:
                continue
            mapping[bn] = cand
            used.add(cand)
            if backtrack(i + 1, mapping, used):
                return True
            del mapping[bn]
            used.discard(cand)
        return False

    return backtrack(0, {}, set())
