"""RDF term model, Turtle-star parsing, and canonical term encoding."""

from .terms import (  # noqa: F401
    BlankNode,
    Literal,
    NamedNode,
    Quad,
    Term,
    Variable,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    encode_literal,
    escape_nt,
    parse_term,
)
