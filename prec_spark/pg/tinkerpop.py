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

Two loaders, identical outputs:

* tinkerpop_to_pg — driver-side row building for fixture-sized
  documents (the corpus goldens).
* tinkerpop_read_json — the SCALE path: `spark.read.json` in
  single-variant-column mode + variant expressions, fully distributed
  (one scan, no driver loop); value typing (string / int / double /
  bool / array) is preserved through the VARIANT type and encoded with
  the same literal rules. Parity with the driver loader is asserted on
  a 10^5-vertex generated corpus (tests/test_tinkerpop_scale.py).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


# ------------------------------------------------------------------ scale
# Distributed GraphSON ingestion: JSON lines -> one VARIANT column ->
# variant expressions. Mirrors encode_literal / _encode_value /
# _encode_props byte-for-byte for bool/int/string/simple-double/array
# values (double formatting follows Java Double.toString, which equals
# python repr() for the plain decimal forms property values use).

from .projection import lit_term_col  # noqa: E402  (escape chain reuse)


def _enc_scalar(v: Column) -> Column:
    """VARIANT scalar -> canonical literal term string (encode_literal)."""
    sch = F.schema_of_variant(v)
    return (
        F.when(
            sch == "BOOLEAN",
            F.concat(
                F.lit('"'),
                F.variant_get(v, "$", "string"),
                F.lit('"^^<http://www.w3.org/2001/XMLSchema#boolean>'),
            ),
        )
        .when(
            # JSON integers beyond int64 surface as DECIMAL(p,0) with
            # p >= 19 digits; keep them xsd:integer via string extraction
            # like the driver's str(int). The precision floor matters:
            # variant parsing strips trailing zeros, so the JSON double
            # `1.0` also reads DECIMAL(1,0) — small-p scale-0 decimals
            # must stay on the double branch below.
            (sch == "BIGINT") | sch.rlike(r"^DECIMAL\((19|[23]\d),0\)$"),
            F.concat(
                F.lit('"'),
                F.variant_get(v, "$", "string"),
                F.lit('"^^<http://www.w3.org/2001/XMLSchema#integer>'),
            ),
        )
        .when(
            # Domain restriction: Java Double.toString equals Python repr
            # only for plain decimal forms — a JSON double outside that
            # range (e.g. 1e20) renders '1.0E20' here vs '1e+20' in the
            # driver loader. Property values in the PG corpus stay plain.
            sch.isin("DOUBLE", "FLOAT") | sch.startswith("DECIMAL"),
            F.concat(
                F.lit('"'),
                F.variant_get(v, "$", "double").cast("string"),
                F.lit('"^^<http://www.w3.org/2001/XMLSchema#double>'),
            ),
        )
        .otherwise(lit_term_col(F.variant_get(v, "$", "string")))
    )


def _enc_value(v: Column) -> Column:
    """Scalar or array VARIANT -> term string ('( ... )' list encoding
    for arrays, matching _encode_value)."""
    is_arr = F.schema_of_variant(v).startswith("ARRAY")
    arr = F.variant_get(v, "$", "array<variant>")
    return F.when(
        is_arr,
        F.concat(
            F.lit("("),
            F.array_join(F.transform(arr, _enc_scalar), " "),
            F.lit(")"),
        ),
    ).otherwise(_enc_scalar(v))


def _enc_props_col(obj: Column) -> Column:
    """VARIANT object of scalar-or-array values -> the PG properties
    map<string, array<string>> (matching _encode_props)."""
    entries = F.map_entries(F.variant_get(obj, "$", "map<string, variant>"))
    return F.map_from_entries(
        F.transform(
            entries, lambda e: F.struct(e["key"], F.array(_enc_value(e["value"])))
        )
    )


def tinkerpop_read_json(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Distributed twin of tinkerpop_to_pg over a JSON-lines file/dir."""
    raw = spark.read.option("singleVariantColumn", "v").json(path)
    v = F.col("v")
    typ = F.variant_get(v, "$.type", "string")

    vertices = raw.filter(typ == "vertex").select(
        F.concat(F.lit("vertex:"), F.variant_get(v, "$.id", "string")).alias(
            "node_id"
        ),
        F.sort_array(
            F.split(F.variant_get(v, "$.label", "string"), "::")
        ).alias("labels"),
        F.coalesce(
            F.variant_get(v, "$.properties", "map<string, array<variant>>"),
            F.map_from_arrays(
                F.array().cast("array<string>"),
                F.array().cast("array<array<variant>>"),
            ),
        ).alias("vprops"),
    )
    nodes = vertices.select(
        "node_id",
        "labels",
        F.map_from_entries(
            F.transform(
                F.map_entries("vprops"),
                lambda e: F.struct(
                    e["key"],
                    F.transform(
                        e["value"],
                        lambda occ: _enc_value(F.variant_get(occ, "$.value", "variant")),
                    ),
                ),
            )
        ).alias("properties"),
    )

    meta = (
        vertices.select(
            "node_id", F.explode("vprops").alias("key", "occurrences")
        )
        .select(
            "node_id",
            "key",
            F.posexplode("occurrences").alias("value_pos", "occ"),
        )
        .withColumn("meta_v", F.try_variant_get(F.col("occ"), "$.meta", "variant"))
        .filter(
            F.col("meta_v").isNotNull() & ~F.is_variant_null(F.col("meta_v"))
        )
        .select(
            F.col("node_id").alias("holder_id"),
            "key",
            "value_pos",
            _enc_props_col(F.col("meta_v")).alias("meta"),
        )
        # an explicit '"meta": {}' is falsy to the driver loader's
        # occ.get('meta') check — drop the empty-object rows here too
        .filter(F.size(F.col("meta")) > 0)
    )

    edges = raw.filter(typ == "edge").select(
        F.concat(F.lit("edge:"), F.variant_get(v, "$.id", "string")).alias("edge_id"),
        F.concat(F.lit("vertex:"), F.variant_get(v, "$.outV", "string")).alias(
            "src_id"
        ),
        F.concat(F.lit("vertex:"), F.variant_get(v, "$.inV", "string")).alias(
            "dst_id"
        ),
        F.variant_get(v, "$.label", "string").alias("label"),
        F.coalesce(
            F.when(
                F.try_variant_get(v, "$.properties", "variant").isNotNull(),
                _enc_props_col(F.variant_get(v, "$.properties", "variant")),
            ),
            F.map_from_arrays(
                F.array().cast("array<string>"),
                F.array().cast("array<array<string>>"),
            ),
        ).alias("properties"),
    )
    return nodes, edges, meta
