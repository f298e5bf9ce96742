"""Minimal Turtle / TriG-star parser (driver-side only).

Parses the rule-catalog ("context") files and golden test graphs.
Contexts are tiny (tens of triples) — parsing is never distributed;
the compiled catalog is broadcast (SURVEY.md §2.1 S5/S9).

Supported surface (everything the reference's corpus uses,
/root/reference/data/*.ttl, src/builtin_rules.ttl, test/prec/*.ttl):
prefixes (@prefix / PREFIX), `a`, predicate/object lists (; ,),
IRIs, prefixed names, blank nodes (_:x, [], [ ... ]), collections,
plain/typed/lang literals incl. triple-quoted, numbers, booleans,
quoted triples << s p o >>, and TriG named graph blocks `term { ... }`.

This is an original implementation of the (public, W3C-specified)
Turtle grammar; no code is derived from the reference repo.
"""

from __future__ import annotations

import re

from .terms import (
    DEFAULT_GRAPH,
    RDF_NS,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    BlankNode,
    Literal,
    NamedNode,
    Quad,
    Term,
    unescape_nt,
)

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<triple_quote>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<string>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
    | (?P<iri><[^<>\s{}|^`\\]*>)
    | (?P<qt_open><<)
    | (?P<qt_close>>>)
    | (?P<bnode>_:[A-Za-z0-9_][A-Za-z0-9_\-.]*)
    | (?P<prefixed>[A-Za-z0-9_\-]*:(?:[A-Za-z0-9_\-%:]|\.(?=[A-Za-z0-9_\-.%:]))*)
    | (?P<keyword>@prefix|@base|(?i:PREFIX|BASE|GRAPH)(?=\s)|a(?=[\s<_\[])|true|false)
    | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9\-]*)
    | (?P<datatype>\^\^)
    | (?P<punct>[;,.\[\](){}])
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"turtle: cannot tokenize at {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        tokens.append((kind, m.group()))
    return tokens


class TurtleParser:
    def __init__(self, text: str):
        self.tokens = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.quads: list[Quad] = []
        self._anon = 0
        self._graph: Term = DEFAULT_GRAPH

    # -- token helpers -------------------------------------------------
    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def _next(self):
        tok = self._peek()
        self.i += 1
        return tok

    def _expect(self, value: str):
        kind, tok = self._next()
        if tok != value:
            raise ValueError(f"turtle: expected {value!r}, got {tok!r} (#{self.i})")

    def _fresh_bnode(self) -> BlankNode:
        self._anon += 1
        return BlankNode(f"anon{self._anon}")

    # -- grammar -------------------------------------------------------
    def parse(self) -> list[Quad]:
        while self._peek()[0] is not None:
            kind, tok = self._peek()
            if kind == "keyword" and tok.lower() in ("@prefix", "prefix"):
                self._next()
                _, pname = self._next()
                iri = self._parse_iri_token()
                if self._peek()[1] == ".":
                    self._next()
                self.prefixes[pname[:-1]] = iri.value
            elif kind == "keyword" and tok.lower() in ("@base", "base"):
                self._next()
                self._parse_iri_token()
                if self._peek()[1] == ".":
                    self._next()
            else:
                self._parse_statement()
        return self.quads

    def _parse_iri_token(self) -> NamedNode:
        kind, tok = self._next()
        if kind == "iri":
            return NamedNode(tok[1:-1])
        if kind == "prefixed":
            return self._resolve_prefixed(tok)
        raise ValueError(f"turtle: expected IRI, got {tok!r}")

    def _resolve_prefixed(self, tok: str) -> NamedNode:
        prefix, _, local = tok.partition(":")
        if prefix not in self.prefixes:
            raise ValueError(f"turtle: unknown prefix {prefix!r}:")
        return NamedNode(self.prefixes[prefix] + local)

    def _parse_statement(self):
        kind, tok = self._peek()
        if kind == "keyword" and tok.upper() == "GRAPH":
            self._next()
        subject = self._parse_term(as_subject=True)
        kind, tok = self._peek()
        if tok == "{":  # TriG named-graph block
            self._next()
            prev, self._graph = self._graph, subject
            while self._peek()[1] != "}":
                self._parse_triples(graph=subject)
            self._graph = prev
            self._next()
            return
        self._parse_predicate_object_list(subject, DEFAULT_GRAPH)
        self._expect(".")

    def _parse_triples(self, graph: Term):
        subject = self._parse_term(as_subject=True)
        self._parse_predicate_object_list(subject, graph)
        if self._peek()[1] == ".":
            self._next()

    def _parse_predicate_object_list(self, subject: Term, graph: Term):
        while True:
            predicate = self._parse_predicate()
            while True:
                obj = self._parse_term()
                self.quads.append(Quad(subject, predicate, obj, graph))
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                self._next()
                # allow trailing ';' before '.' or '}'
                if self._peek()[1] in (".", "}", "]") or self._peek()[0] is None:
                    return
                continue
            return

    def _parse_predicate(self) -> Term:
        kind, tok = self._peek()
        if kind == "keyword" and tok == "a":
            self._next()
            return NamedNode(RDF_NS + "type")
        return self._parse_iri_token()

    def _parse_term(self, as_subject: bool = False) -> Term:
        kind, tok = self._peek()
        if kind == "iri" or kind == "prefixed":
            return self._parse_iri_token()
        if kind == "bnode":
            self._next()
            return BlankNode(tok[2:])
        if kind == "qt_open":
            self._next()
            s = self._parse_term(as_subject=True)
            p = self._parse_predicate()
            o = self._parse_term()
            kindc, tokc = self._next()
            if kindc != "qt_close":
                raise ValueError(f"turtle: expected >>, got {tokc!r}")
            return Quad(s, p, o)
        if tok == "[":
            self._next()
            node = self._fresh_bnode()
            if self._peek()[1] != "]":
                self._parse_predicate_object_list(node, self._graph)
            self._expect("]")
            return node
        if tok == "(":
            self._next()
            items = []
            while self._peek()[1] != ")":
                items.append(self._parse_term())
            self._next()
            return self._build_list(items)
        if kind in ("string", "triple_quote"):
            self._next()
            lex = unescape_nt(tok[3:-3] if kind == "triple_quote" else tok[1:-1])
            nkind, ntok = self._peek()
            if nkind == "datatype":
                self._next()
                dt = self._parse_iri_token()
                return Literal(lex, dt.value)
            if nkind == "langtag":
                self._next()
                return Literal(lex, XSD_STRING, ntok[1:])
            return Literal(lex)
        if kind == "keyword" and tok in ("true", "false"):
            self._next()
            return Literal(tok, XSD_BOOLEAN)
        if kind == "number":
            self._next()
            if re.fullmatch(r"[+-]?\d+", tok):
                return Literal(tok, XSD_INTEGER)
            return Literal(tok, XSD_DOUBLE)
        raise ValueError(f"turtle: unexpected token {tok!r} (as_subject={as_subject})")

    def _build_list(self, items: list[Term]) -> Term:
        head: Term = NamedNode(RDF_NS + "nil")
        for item in reversed(items):
            node = self._fresh_bnode()
            self.quads.append(Quad(node, NamedNode(RDF_NS + "first"), item, self._graph))
            self.quads.append(Quad(node, NamedNode(RDF_NS + "rest"), head, self._graph))
            head = node
        return head


def parse_turtle(text: str) -> list[Quad]:
    """Parse Turtle/TriG-star text into a list of Quads."""
    return TurtleParser(text).parse()
