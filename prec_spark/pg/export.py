"""Property-graph store export: Cypher CREATE and Gremlin insert sinks.

The reference exports a reverted property graph back into live stores:

* ``makeCypherQuery`` builds ONE driver-side ``CREATE`` statement for
  the whole graph, with statement-local identifiers ``node1..nodeN``
  (/root/reference/src/prec-0/prec-0-reversion.ts:341-389).
* ``insertIntoGremlin`` walks nodes then edges through a live TinkerPop
  ``DriverRemoteConnection``, one traversal per element
  (/root/reference/src/prec-0/prec-0-reversion.ts:398-438).

Neither shape survives 100 TB: a single statement string and a
driver-side await-per-element loop are both O(graph) on one machine.
The Spark-first re-expression keeps the *statement semantics* but emits
them as a distributed DataFrame of per-element statements:

* nodes:  ``CREATE (:`L1`:`L2` {`_prec_id`: "<id>", `k`: v, ...})``
* edges:  ``MATCH (s {`_prec_id`: "<src>"}), (d {`_prec_id`: "<dst>"})
          CREATE (s)-[:`L` {...}]->(d)``

Statement-local identifiers cannot cross executors, so elements are
keyed by an explicit ``_prec_id`` property instead — the standard
distributed Neo4j ingest idiom (each statement is independently
executable; edge MATCH hits the unique-property index). Everything is
JVM-side string expression work inside whole-stage codegen; no Python,
no shuffle (two narrow scans).

``make_cypher_query`` reproduces the reference's exact single-statement
format (identifiers, label/property spacing) for small graphs via
toLocalIterator — the parity surface for the reference's own tests.

Value conversion mirrors the reference's ``JSON.stringify`` on the
property values (prec-0-reversion.ts:353-366): our PG stores values
term-encoded (canonical N-Triples literal strings, rdf/terms.py), so

* plain string literals ``"..."`` are ALREADY valid Cypher/JSON string
  syntax (same escape set) and pass through unchanged,
* ``"lex"^^xsd:integer|double|boolean`` drop to the raw lexical form
  (Cypher numbers / booleans),
* list-encoded values ``("a" "b")`` and multi-valued properties become
  Cypher lists ``[...]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..rdf.terms import XSD

_LITERAL_RE = r'"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>)?'
_RAW_DTYPES = tuple(f"^^<{XSD}{t}>" for t in ("integer", "double", "boolean"))
_PLAIN_NAME = "^[A-Za-z_][A-Za-z0-9_]*$"


def _scalar_cypher_value(term: Column) -> Column:
    """One term-encoded scalar -> Cypher value text."""
    raw = F.regexp_extract(term, r'^"((?:[^"\\]|\\.)*)"', 1)
    cond = None
    for suffix in _RAW_DTYPES:
        c = term.endswith(suffix)
        cond = c if cond is None else (cond | c)
    # plain "..." literal: already valid Cypher string syntax
    return F.when(cond, raw).otherwise(term)


def _cypher_value(term: Column) -> Column:
    """Term-encoded value (scalar or ``(..)`` list) -> Cypher value."""
    items = F.regexp_extract_all(term, F.lit(_LITERAL_RE), F.lit(0))
    as_list = F.concat(
        F.lit("["),
        F.array_join(F.transform(items, _scalar_cypher_value), ", "),
        F.lit("]"),
    )
    return F.when(term.startswith("("), as_list).otherwise(
        _scalar_cypher_value(term)
    )


def _render_value(arr: Column) -> Column:
    """A property's value array -> Cypher value (scalar or list)."""
    multi = F.concat(
        F.lit("["),
        F.array_join(F.transform(arr, _cypher_value), ", "),
        F.lit("]"),
    )
    return F.when(F.size(arr) == 1, _cypher_value(F.element_at(arr, 1))).otherwise(
        multi
    )


def _name(col: Column) -> Column:
    """Label / property-key quoting: backtick unless a plain identifier."""
    return F.when(col.rlike(_PLAIN_NAME), col).otherwise(
        F.concat(F.lit("`"), F.replace(col, F.lit("`"), F.lit("``")), F.lit("`"))
    )


def _id_string(col: Column) -> Column:
    """Element id -> Cypher string literal (ids never need escaping
    beyond the JSON set; reuse the N-Triples escape)."""
    from .projection import lit_term_col

    return lit_term_col(col)


def _props_fragment(properties: Column, id_entry: Column | None) -> Column:
    """``{`_prec_id`: "...", `k`: v, ...}`` with keys sorted; empty map
    with no id -> '' (the reference omits the braces,
    prec-0-reversion.ts:354-355)."""
    entries = F.sort_array(F.map_entries(properties))
    rendered = F.transform(
        entries,
        lambda e: F.concat(_name(e["key"]), F.lit(": "), _render_value(e["value"])),
    )
    if id_entry is not None:
        rendered = F.concat(F.array(id_entry), rendered)
    return F.when(F.size(rendered) > 0, F.concat(
        F.lit("{"), F.array_join(rendered, ", "), F.lit("}")
    )).otherwise(F.lit(""))


def _labels_fragment(labels: Column) -> Column:
    return F.array_join(
        F.transform(labels, lambda l: F.concat(F.lit(":"), _name(l))), ""
    )


def cypher_create_statements(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Distributed Cypher export: (kind, stmt) — every statement is
    independently executable against a store with a unique index on
    ``_prec_id`` (``CREATE CONSTRAINT ... REQUIRE n._prec_id IS
    UNIQUE``). Two narrow scans, no shuffle."""
    id_entry = lambda c: F.concat(  # noqa: E731
        F.lit("`_prec_id`: "), _id_string(F.col(c))
    )
    node_stmts = nodes.select(
        F.lit("node").alias("kind"),
        F.concat(
            F.lit("CREATE ("),
            _labels_fragment(F.col("labels")),
            F.lit(" "),
            _props_fragment(F.col("properties"), id_entry("node_id")),
            F.lit(")"),
        ).alias("stmt"),
    )
    edge_props = _props_fragment(F.col("properties"), None)
    edge_stmts = edges.select(
        F.lit("edge").alias("kind"),
        F.concat(
            F.lit("MATCH (s {`_prec_id`: "),
            _id_string(F.col("src_id")),
            F.lit("}), (d {`_prec_id`: "),
            _id_string(F.col("dst_id")),
            F.lit("}) CREATE (s)-[:"),
            _name(F.col("label")),
            F.when(edge_props != "", F.concat(F.lit(" "), edge_props)).otherwise(
                F.lit("")
            ),
            F.lit("]->(d)"),
        ).alias("stmt"),
    )
    return node_stmts.unionByName(edge_stmts)


def make_cypher_query(
    nodes: DataFrame, edges: DataFrame, max_elements: int = 100_000
) -> str:
    """The reference's exact single-statement form (identifiers
    ``node1..nodeN`` in node order, ``CREATE `` + instructions joined
    with ``,\\n       `` + ``;``; prec-0-reversion.ts:341-389).

    Driver-side by construction — only for graphs that fit one
    statement (the reference's own usage); raises above `max_elements`
    instead of silently materializing a 100 TB string. Elements are
    ordered by id for a deterministic statement (the reference relies
    on JS insertion order; DataFrames have none)."""
    total = nodes.count() + edges.count()
    if total > max_elements:
        raise ValueError(
            f"single-statement Cypher export of {total} elements exceeds "
            f"max_elements={max_elements}; use cypher_create_statements "
            "for a distributed export"
        )
    rows = nodes.orderBy("node_id").select(
        "node_id",
        _labels_fragment_spaced(F.col("labels")).alias("labels_frag"),
        _props_fragment(F.col("properties"), None).alias("props_frag"),
    )
    ids: dict[str, str] = {}
    instructions: list[str] = []
    for row in rows.toLocalIterator():
        ident = f"node{len(ids) + 1}"
        ids[row["node_id"]] = ident
        instructions.append(f"({ident} {row['labels_frag']} {row['props_frag']})")
    edge_rows = edges.orderBy("edge_id").select(
        "src_id",
        "dst_id",
        "label",
        _props_fragment(F.col("properties"), None).alias("props_frag"),
    )
    for row in edge_rows.toLocalIterator():
        edge_string = f":{row['label']} {row['props_frag']}"
        instructions.append(
            f"({ids[row['src_id']]})-[{edge_string}]->({ids[row['dst_id']]})"
        )
    if not instructions:
        return ""
    return "CREATE " + ",\n       ".join(instructions) + ";"


def _labels_fragment_spaced(labels: Column) -> Column:
    """Reference label spacing: ``:A :B`` (join(" "),
    prec-0-reversion.ts:374)."""
    return F.array_join(
        F.transform(labels, lambda l: F.concat(F.lit(":"), l)), " "
    )


# ------------------------------------------------------------------ Gremlin

def _gremlin_string(term_content: Column) -> Column:
    """Term-escaped string content -> single-quoted Groovy string.
    Term escapes (\\\\, \\n, \\r, \\t) are valid Groovy escapes; only
    the quote flavor changes: ``\\"`` -> ``"``, ``'`` -> ``\\'``."""
    c = F.replace(term_content, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("'"), F.lit("\\'"))
    return F.concat(F.lit("'"), c, F.lit("'"))


def _gremlin_raw_string(col: Column) -> Column:
    """RAW (un-term-encoded) string — ids, labels — to Groovy string."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit("'"), F.lit("\\'"))
    return F.concat(F.lit("'"), c, F.lit("'"))


def _scalar_gremlin_value(term: Column) -> Column:
    content = F.regexp_extract(term, r'^"((?:[^"\\]|\\.)*)"', 1)
    cond = None
    for suffix in _RAW_DTYPES:
        c = term.endswith(suffix)
        cond = c if cond is None else (cond | c)
    return F.when(cond, content).otherwise(_gremlin_string(content))


def _gremlin_property_calls(properties: Column, extra_first: Column | None) -> Column:
    """``.property('k', v)`` chain; list / multi-valued values emit one
    call per item (the reference passes the raw JS value per key,
    prec-0-reversion.ts:417-419 — TinkerPop default cardinality)."""
    items_of = lambda v: F.when(  # noqa: E731
        v.startswith("("),
        F.regexp_extract_all(v, F.lit(_LITERAL_RE), F.lit(0)),
    ).otherwise(F.array(v))
    entries = F.sort_array(F.map_entries(properties))
    calls = F.flatten(
        F.transform(
            entries,
            lambda e: F.transform(
                F.flatten(F.transform(e["value"], items_of)),
                lambda item: F.concat(
                    F.lit(".property("),
                    _gremlin_raw_string(e["key"]),
                    F.lit(", "),
                    _scalar_gremlin_value(item),
                    F.lit(")"),
                ),
            ),
        )
    )
    if extra_first is not None:
        calls = F.concat(F.array(extra_first), calls)
    return F.array_join(calls, "")


def gremlin_insert_statements(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Distributed Gremlin export: (kind, stmt), one traversal per
    element like the reference's live loop (addV label join ``::``,
    prec-0-reversion.ts:411-414), keyed by ``_prec_id`` so edge
    traversals are executor-independent."""
    id_call = lambda c: F.concat(  # noqa: E731
        F.lit(".property('_prec_id', "), _gremlin_raw_string(F.col(c)), F.lit(")")
    )
    node_stmts = nodes.select(
        F.lit("node").alias("kind"),
        F.concat(
            F.when(
                F.size("labels") == 0, F.lit("g.addV()")
            ).otherwise(
                F.concat(
                    F.lit("g.addV("),
                    _gremlin_raw_string(F.array_join(F.col("labels"), "::")),
                    F.lit(")"),
                )
            ),
            _gremlin_property_calls(F.col("properties"), id_call("node_id")),
            F.lit(".next()"),
        ).alias("stmt"),
    )
    edge_stmts = edges.select(
        F.lit("edge").alias("kind"),
        F.concat(
            F.lit("g.V().has('_prec_id', "),
            _gremlin_raw_string(F.col("src_id")),
            F.lit(").addE("),
            _gremlin_raw_string(F.col("label")),
            F.lit(").to(__.V().has('_prec_id', "),
            _gremlin_raw_string(F.col("dst_id")),
            F.lit("))"),
            _gremlin_property_calls(F.col("properties"), None),
            F.lit(".iterate()"),
        ).alias("stmt"),
    )
    return node_stmts.unionByName(edge_stmts)
