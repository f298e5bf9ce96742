"""Cypher CREATE / Gremlin insert sinks (SURVEY.md §2 S7/S8).

Reference behavior: makeCypherQuery builds one driver-side CREATE
statement (prec-0-reversion.ts:341-389); insertIntoGremlin walks a live
connection (:398-438). These tests pin (a) the distributed per-element
statement semantics incl. every value-conversion branch, (b) the
reference-exact single-statement format, (c) a real roundtrip: the
emitted Cypher statements re-parsed into a PG equal to the input."""

import re

from pyspark.sql import functions as F

from prec_spark.pg.export import (
    cypher_create_statements,
    gremlin_insert_statements,
    make_cypher_query,
)
from prec_spark.rdf.terms import XSD


def _pg(spark):
    """Small PG covering: multi-label, number/bool/string scalars,
    list-encoded value, multi-valued property, key needing backticks,
    empty properties, edge with and without properties."""
    nodes = spark.createDataFrame(
        [
            (
                "n:1",
                ["B", "A"],
                {
                    "name": ['"Alice"'],
                    "age": [f'"33"^^<{XSD}integer>'],
                    "odd key": ['"x"'],
                },
            ),
            (
                "n:2",
                ["A"],
                {
                    "score": [f'"1.5"^^<{XSD}double>'],
                    "ok": [f'"true"^^<{XSD}boolean>'],
                    "tags": ['("a" "b")'],
                    "multi": ['"p"', '"q"'],
                },
            ),
            ("n:3", [], {}),
        ],
        "node_id string, labels array<string>, properties map<string,array<string>>",
    ).withColumn("labels", F.sort_array("labels"))
    edges = spark.createDataFrame(
        [
            ("e:1", "n:1", "n:2", "KNOWS", {"since": [f'"2020"^^<{XSD}integer>']}),
            ("e:2", "n:2", "n:3", "LIKES", {}),
        ],
        "edge_id string, src_id string, dst_id string, label string, "
        "properties map<string,array<string>>",
    )
    return nodes, edges


def test_cypher_statements_value_conversions(spark):
    nodes, edges = _pg(spark)
    stmts = {
        r["stmt"] for r in cypher_create_statements(nodes, edges).collect()
    }
    assert (
        'CREATE (:A:B {`_prec_id`: "n:1", age: 33, name: "Alice", `odd key`: "x"})'
        in stmts
    )
    assert (
        'CREATE (:A {`_prec_id`: "n:2", multi: ["p", "q"], ok: true, '
        'score: 1.5, tags: ["a", "b"]})' in stmts
    )
    assert 'CREATE ( {`_prec_id`: "n:3"})' in stmts
    assert (
        'MATCH (s {`_prec_id`: "n:1"}), (d {`_prec_id`: "n:2"}) '
        "CREATE (s)-[:KNOWS {since: 2020}]->(d)" in stmts
    )
    assert (
        'MATCH (s {`_prec_id`: "n:2"}), (d {`_prec_id`: "n:3"}) '
        "CREATE (s)-[:LIKES]->(d)" in stmts
    )


def test_gremlin_statements_value_conversions(spark):
    nodes, edges = _pg(spark)
    stmts = {
        r["stmt"] for r in gremlin_insert_statements(nodes, edges).collect()
    }
    assert (
        "g.addV('A::B').property('_prec_id', 'n:1').property('age', 33)"
        ".property('name', 'Alice').property('odd key', 'x').next()" in stmts
    )
    # list + multi-valued: one .property() call per item
    assert (
        "g.addV('A').property('_prec_id', 'n:2').property('multi', 'p')"
        ".property('multi', 'q').property('ok', true).property('score', 1.5)"
        ".property('tags', 'a').property('tags', 'b').next()" in stmts
    )
    assert "g.addV().property('_prec_id', 'n:3').next()" in stmts
    assert (
        "g.V().has('_prec_id', 'n:1').addE('KNOWS')"
        ".to(__.V().has('_prec_id', 'n:2')).property('since', 2020).iterate()"
        in stmts
    )


def test_single_statement_reference_format(spark):
    nodes, edges = _pg(spark)
    q = make_cypher_query(nodes, edges)
    # reference shape: CREATE + instructions joined ',\n       ' + ';'
    # (prec-0-reversion.ts:346-348), node identifiers in order,
    # label spacing ':A :B' (:374), edges referencing identifiers.
    assert q.startswith("CREATE (node1 :A :B {")
    assert q.endswith(";")
    assert ",\n       " in q
    assert "(node1)-[:KNOWS {since: 2020}]->(node2)" in q
    assert "(node2)-[:LIKES ]->(node3)" in q  # reference keeps the space
    # deterministic: same statement twice
    assert q == make_cypher_query(nodes, edges)


def test_single_statement_guard(spark):
    nodes, edges = _pg(spark)
    try:
        make_cypher_query(nodes, edges, max_elements=2)
    except ValueError as e:
        assert "cypher_create_statements" in str(e)
    else:
        raise AssertionError("expected ValueError above max_elements")


_NODE_RE = re.compile(
    r'^CREATE \((?P<labels>(?::[^\s{]+)*) \{`_prec_id`: "(?P<id>[^"]*)"'
    r"(?:, (?P<props>.*))?\}\)$"
)
_EDGE_RE = re.compile(
    r'^MATCH \(s \{`_prec_id`: "(?P<src>[^"]*)"\}\), '
    r'\(d \{`_prec_id`: "(?P<dst>[^"]*)"\}\) '
    r"CREATE \(s\)-\[:(?P<label>[^\s\]]+)(?: \{(?P<props>.*)\})?\]->\(d\)$"
)


def test_cypher_statements_roundtrip_movies(spark):
    """Every emitted statement parses; ids/labels/edges reconstruct the
    movies PG exactly (node set, label multiset, edge endpoints)."""
    import json
    import pathlib

    from prec_spark.pg.cypher import cypher_to_pg

    rows = json.loads(
        pathlib.Path("/root/reference/data/movies_cypher_all.json").read_text()
    )
    nodes, edges = cypher_to_pg(spark, rows)
    got_nodes, got_edges = set(), set()
    for r in cypher_create_statements(nodes, edges).collect():
        if r["kind"] == "node":
            m = _NODE_RE.match(r["stmt"])
            assert m, r["stmt"]
            got_nodes.add((m.group("id"), m.group("labels")))
        else:
            m = _EDGE_RE.match(r["stmt"])
            assert m, r["stmt"]
            got_edges.add((m.group("src"), m.group("dst"), m.group("label")))
    want_nodes = {
        (r["node_id"], "".join(f":{l}" for l in r["labels"]))
        for r in nodes.select("node_id", "labels").collect()
    }
    want_edges = {
        (r["src_id"], r["dst_id"], r["label"])
        for r in edges.select("src_id", "dst_id", "label").collect()
    }
    assert got_nodes == want_nodes
    assert got_edges == want_edges
