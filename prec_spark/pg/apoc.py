"""APOC JSON-lines property-graph loader (test fixtures / interop).

The reference ingests Neo4j APOC exports — one JSON doc per line, nodes
then relationships (/root/reference/src/cli_.ts:305-317,
src/prec-0/PGDefinitions.ts:4-18). This loader produces the same
nodes/edges DataFrames the transcript projection produces, so every
downstream operator is shared.

Fixture files are tiny; rows are built driver-side. (A scale path would
be spark.read.json — S3 in SURVEY.md §2.1 — but APOC exports are not
our 100 TB input, transcripts are.)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..rdf.terms import encode_literal

NODES_SCHEMA = "node_id STRING, labels ARRAY<STRING>, properties MAP<STRING, ARRAY<STRING>>"
EDGES_SCHEMA = (
    "edge_id STRING, src_id STRING, dst_id STRING, label STRING, "
    "properties MAP<STRING, ARRAY<STRING>>"
)


def _encode_props(properties: dict | None) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for key, value in (properties or {}).items():
        if isinstance(value, list):
            # Array value -> one list-encoded property value; becomes an
            # rdf:first/rdf:rest chain in PREC-0 (graph-builder.ts:184-199).
            out[key] = ["(" + " ".join(encode_literal(v) for v in value) + ")"]
        else:
            out[key] = [encode_literal(value)]
    return out


def apoc_to_pg(
    spark: SparkSession, docs: list[dict] | str
) -> tuple[DataFrame, DataFrame]:
    """Build (nodes, edges) DataFrames from APOC documents.

    `docs` may be a JSONL string or an already-parsed list of dicts.
    """
    if isinstance(docs, str):
        docs = [json.loads(line) for line in docs.splitlines() if line.strip()]

    node_rows, edge_rows = [], []
    for doc in docs:
        if doc["type"] == "node":
            node_rows.append(
                (
                    f"node:{doc['id']}",
                    sorted(doc.get("labels") or []),
                    _encode_props(doc.get("properties")),
                )
            )
        elif doc["type"] == "relationship":
            edge_rows.append(
                (
                    f"edge:{doc['id']}",
                    f"node:{doc['start']['id']}",
                    f"node:{doc['end']['id']}",
                    doc["label"],
                    _encode_props(doc.get("properties")),
                )
            )
        else:
            raise ValueError(f"unknown APOC doc type: {doc['type']!r}")

    nodes = spark.createDataFrame(node_rows, NODES_SCHEMA)
    edges = spark.createDataFrame(edge_rows, EDGES_SCHEMA)
    return nodes, edges
