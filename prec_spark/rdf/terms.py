"""RDF term model + canonical string encoding.

The engine represents RDF terms *in DataFrames* as canonical
N-Triples-style strings (RDF-star: nested quads serialize as
``<< s p o >>``). This keeps the quad table a plain 3-column string
DataFrame — joinable, hashable, whole-stage-codegen friendly, and
directly comparable with the DuckDB oracle (no cross-engine
struct-hash hazards).

Driver-side (context compilation, tiny data) we use the Python classes
below; they serialize to exactly the same canonical strings the Spark
expressions build.

Reference parity: term kinds mirror the RDF/JS model used throughout
BruJu/PREC (e.g. /root/reference/src/rdf/quad-star.ts:23-38); the
serialization is standard N-Triples plus the RDF-star <<...>> form.
"""

from __future__ import annotations

from dataclasses import dataclass, field

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
PREC_NS = "http://bruy.at/prec#"
PVAR_NS = "http://bruy.at/prec-trans#"
PGO_NS = "http://ii.uwb.edu.pl/pgo#"

_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]


def escape_nt(s: str) -> str:
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


def unescape_nt(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            out.append({"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class Term:
    """Base class; subclasses are frozen dataclasses usable as dict keys."""

    def nt(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass(frozen=True)
class NamedNode(Term):
    value: str

    def nt(self) -> str:
        return f"<{self.value}>"


@dataclass(frozen=True)
class BlankNode(Term):
    value: str

    def nt(self) -> str:
        return f"_:{self.value}"


@dataclass(frozen=True)
class Literal(Term):
    value: str
    datatype: str = XSD_STRING
    language: str = ""

    def nt(self) -> str:
        lex = f'"{escape_nt(self.value)}"'
        if self.language:
            return f"{lex}@{self.language}"
        if self.datatype and self.datatype != XSD_STRING:
            return f"{lex}^^<{self.datatype}>"
        return lex


@dataclass(frozen=True)
class Variable(Term):
    value: str

    def nt(self) -> str:
        return f"?{self.value}"


@dataclass(frozen=True)
class Quad(Term):
    s: Term
    p: Term
    o: Term
    g: Term = field(default=None)  # type: ignore[assignment]

    def nt(self) -> str:
        return f"<< {self.s.nt()} {self.p.nt()} {self.o.nt()} >>"

    def terms(self):
        return (self.s, self.p, self.o)


DEFAULT_GRAPH = NamedNode("")


def encode_literal(value) -> str:
    """Encode a raw python value as a canonical literal term string.

    Mirrors the reference's property-value typing: strings stay plain,
    ints become xsd:integer, floats xsd:double, bools xsd:boolean
    (/root/reference/src/rdf/utils.ts:15-45).
    """
    if isinstance(value, bool):
        return Literal("true" if value else "false", XSD_BOOLEAN).nt()
    if isinstance(value, int):
        return Literal(str(value), XSD_INTEGER).nt()
    if isinstance(value, float):
        return Literal(repr(value), XSD_DOUBLE).nt()
    return Literal(str(value)).nt()


def parse_term(text: str) -> Term:
    """Parse one canonical term string back into a Term (driver-side)."""
    term, rest = _parse_term(text.strip())
    if rest.strip():
        raise ValueError(f"trailing content after term: {rest!r}")
    return term


def _parse_term(text: str) -> tuple[Term, str]:
    text = text.lstrip()
    if text.startswith("<<"):
        body = text[2:]
        s, body = _parse_term(body)
        p, body = _parse_term(body)
        o, body = _parse_term(body)
        body = body.lstrip()
        if not body.startswith(">>"):
            raise ValueError(f"unterminated quoted triple near {body[:40]!r}")
        return Quad(s, p, o), body[2:]
    if text.startswith("<"):
        end = text.index(">")
        return NamedNode(text[1:end]), text[end + 1 :]
    if text.startswith("_:"):
        i = 2
        while i < len(text) and (text[i].isalnum() or text[i] in "_-."):
            i += 1
        return BlankNode(text[2:i]), text[i:]
    if text.startswith("?"):
        i = 1
        while i < len(text) and (text[i].isalnum() or text[i] == "_"):
            i += 1
        return Variable(text[1:i]), text[i:]
    if text.startswith('"'):
        i, buf = 1, []
        while i < len(text):
            c = text[i]
            if c == "\\":
                buf.append(text[i : i + 2])
                i += 2
                continue
            if c == '"':
                break
            buf.append(c)
            i += 1
        lex = unescape_nt("".join(buf))
        rest = text[i + 1 :]
        if rest.startswith("^^<"):
            end = rest.index(">")
            return Literal(lex, rest[3:end]), rest[end + 1 :]
        if rest.startswith("@"):
            j = 1
            while j < len(rest) and (rest[j].isalnum() or rest[j] == "-"):
                j += 1
            return Literal(lex, XSD_STRING, rest[1:j]), rest[j:]
        return Literal(lex), rest
    raise ValueError(f"cannot parse term from {text[:60]!r}")
