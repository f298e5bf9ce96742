"""GraphML export of the property graph — one XML line per element.

Sibling of the Cypher/Gremlin statement sinks (pg/export.py): GraphML
is the interchange format Gephi / yEd / NetworkX consume, so a
reference user migrating visualization or analysis tooling gets their
graph out without a live store. The export is DISTRIBUTED document
assembly: every node/edge renders to one self-contained line (XML
attributes escaped), the constant header/footer lines ride along as a
tiny literal frame, and the writer's only global obligation is line
ORDER — at scale you write the body partitions as-is and concatenate
header + parts + footer at the storage layer, so no worker ever holds
more than its partition (same shape as the N-Triples sink).

The driver gate hashes the full line set: escaping, label/property
key rendering, and endpoint wiring are all value-checked against a
DuckDB twin that rebuilds every line with SQL string functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _xml_escape(col: Column) -> Column:
    """Attribute-value escaping: & first, then < > "."""
    out = col
    for raw, esc in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;")]:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def _xml_escape_sql(col: str) -> str:
    out = col
    for raw, esc in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;")]:
        out = f"replace({out}, '{raw}', '{esc}')"
    return out


HEADER = [
    '<?xml version="1.0" encoding="UTF-8"?>',
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
    '<graph id="G" edgedefault="directed">',
]
FOOTER = ["</graph>", "</graphml>"]


def graphml_lines(
    spark: SparkSession, nodes: DataFrame, edges: DataFrame
) -> DataFrame:
    """(line): the GraphML document as a line relation."""
    node_lines = nodes.select(
        F.concat(
            F.lit('<node id="'),
            _xml_escape(F.col("node_id")),
            F.lit('" labels="'),
            _xml_escape(F.array_join(F.col("labels"), "|")),
            F.lit('" keys="'),
            _xml_escape(
                F.array_join(F.sort_array(F.map_keys(F.col("properties"))), "|")
            ),
            F.lit('"/>'),
        ).alias("line")
    )
    edge_lines = edges.select(
        F.concat(
            F.lit('<edge id="'),
            _xml_escape(F.col("edge_id")),
            F.lit('" source="'),
            _xml_escape(F.col("src_id")),
            F.lit('" target="'),
            _xml_escape(F.col("dst_id")),
            F.lit('" label="'),
            _xml_escape(F.col("label")),
            F.lit('"/>'),
        ).alias("line")
    )
    frame = spark.createDataFrame(
        [(x,) for x in HEADER + FOOTER], "line string"
    )
    return frame.unionAll(node_lines).unionAll(edge_lines)


def graphml_oracle_sql(nodes_sql: str, edges_sql: str) -> str:
    consts = "\nUNION ALL\n".join(
        "SELECT '" + x.replace("'", "''") + "' AS line"
        for x in HEADER + FOOTER
    )
    nid = _xml_escape_sql("node_id")
    nlab = _xml_escape_sql("labels_key")
    nkeys = _xml_escape_sql("props_key")
    eid = _xml_escape_sql("edge_id")
    esrc = _xml_escape_sql("src_id")
    edst = _xml_escape_sql("dst_id")
    elab = _xml_escape_sql("label")
    return f"""
WITH n AS ({nodes_sql}), e AS ({edges_sql})
{consts}
UNION ALL
SELECT '<node id="' || {nid} || '" labels="' || {nlab}
       || '" keys="' || {nkeys} || '"/>' FROM n
UNION ALL
SELECT '<edge id="' || {eid} || '" source="' || {esrc}
       || '" target="' || {edst} || '" label="' || {elab} || '"/>' FROM e
"""
