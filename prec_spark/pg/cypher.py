"""Cypher-query JSON loader (S4 in SURVEY.md §2.1).

The reference ingests `match (src)-[edge]->(dest)` result rows and
dedups nodes/edges by identity (neo4JCypherToStore,
/root/reference/src/prec/graph-builder.ts:42-65). Same output schema as
the other loaders, so the whole engine applies.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .apoc import EDGES_SCHEMA, NODES_SCHEMA, _encode_props


def cypher_to_pg(
    spark: SparkSession, rows: list[dict] | str
) -> tuple[DataFrame, DataFrame]:
    """Build (nodes, edges) from [{src, edge, dest}, ...] rows."""
    if isinstance(rows, str):
        rows = json.loads(rows)

    nodes: dict = {}
    edges: dict = {}
    for row in rows:
        for key in ("src", "dest"):
            n = row.get(key)
            if n is not None:
                nodes[n["identity"]] = n
        e = row.get("edge")
        if e is not None:
            edges[e["identity"]] = e

    node_rows = [
        (
            f"node:{ident}",
            sorted(n.get("labels") or []),
            _encode_props(n.get("properties")),
        )
        for ident, n in nodes.items()
    ]
    edge_rows = [
        (
            f"edge:{ident}",
            f"node:{e['start']}",
            f"node:{e['end']}",
            e["type"],
            _encode_props(e.get("properties")),
        )
        for ident, e in edges.items()
    ]
    return (
        spark.createDataFrame(node_rows, NODES_SCHEMA),
        spark.createDataFrame(edge_rows, EDGES_SCHEMA),
    )
