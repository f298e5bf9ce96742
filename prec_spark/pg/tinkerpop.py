"""TinkerPop/GraphSON-shaped property-graph loader (S2's row shape).

A live Gremlin server is out of scope in this sandbox (SURVEY.md §2.1),
but the TinkerPop DATA MODEL — vertex properties that are themselves
property holders (meta-properties) — is ingested here from GraphSON-ish
documents, one dict per element:

    {"type": "vertex", "id": "1", "label": "person" | "a::b",
     "properties": {"name": [{"value": "marko",
                              "meta": {"since": 2010}}, ...]}}
    {"type": "edge", "id": "7", "label": "knows",
     "outV": "1", "inV": "2", "properties": {"weight": 0.5}}

Produces the standard (nodes, edges) PG DataFrames plus the meta side
table consumed by prec0_quads (holder_id, key, value_pos, meta).
Reference data model: TinkerPop VertexProperty (from-gremlin.js:88-140,
graph-builder.ts:388-407).

Fixture documents are tiny; rows are built driver-side like the APOC
loader. (The scale path is spark.read.json with the same schemas.)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..rdf.terms import encode_literal
from .apoc import EDGES_SCHEMA, NODES_SCHEMA, _encode_props

META_SCHEMA = (
    "holder_id STRING, key STRING, value_pos INT, "
    "meta MAP<STRING, ARRAY<STRING>>"
)


def _encode_value(value) -> str:
    if isinstance(value, list):
        return "(" + " ".join(encode_literal(v) for v in value) + ")"
    return encode_literal(value)


def tinkerpop_to_pg(
    spark: SparkSession, docs: list[dict] | str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build (nodes, edges, meta) DataFrames from TinkerPop documents."""
    if isinstance(docs, str):
        docs = [json.loads(line) for line in docs.splitlines() if line.strip()]

    node_rows, edge_rows, meta_rows = [], [], []
    for doc in docs:
        if doc["type"] == "vertex":
            node_id = f"vertex:{doc['id']}"
            props: dict[str, list[str]] = {}
            for key, occurrences in (doc.get("properties") or {}).items():
                values = []
                for pos, occ in enumerate(occurrences):
                    values.append(_encode_value(occ["value"]))
                    if occ.get("meta"):
                        meta_rows.append(
                            (node_id, key, pos, _encode_props(occ["meta"]))
                        )
                props[key] = values
            node_rows.append(
                (node_id, sorted(doc["label"].split("::")), props)
            )
        elif doc["type"] == "edge":
            edge_rows.append(
                (
                    f"edge:{doc['id']}",
                    f"vertex:{doc['outV']}",
                    f"vertex:{doc['inV']}",
                    doc["label"],
                    _encode_props(doc.get("properties")),
                )
            )
        else:
            raise ValueError(f"unknown TinkerPop document type: {doc['type']!r}")

    nodes = spark.createDataFrame(node_rows, NODES_SCHEMA)
    edges = spark.createDataFrame(edge_rows, EDGES_SCHEMA)
    meta = spark.createDataFrame(meta_rows, META_SCHEMA)
    return nodes, edges, meta
