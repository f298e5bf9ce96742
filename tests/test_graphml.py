"""GraphML export: escaping, structure, and parseability."""

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from prec_spark.cached import cached_transcripts
from prec_spark.pg.graphml import FOOTER, HEADER, graphml_lines
from prec_spark.pg.projection import pg_edges, pg_nodes

from .conftest import SF_DIR


def test_graphml_escapes_attributes(spark):
    nodes = spark.createDataFrame(
        [('a<b>&"c', ["L&1"], {"k<": ["v"]})],
        "node_id string, labels array<string>, properties map<string,array<string>>",
    )
    edges = spark.createDataFrame(
        [], "edge_id string, src_id string, dst_id string, label string"
    )
    lines = [r.line for r in graphml_lines(spark, nodes, edges).collect()]
    node_line = [x for x in lines if x.startswith("<node")][0]
    assert "&lt;" in node_line and "&amp;" in node_line and "&quot;" in node_line
    assert '"c' not in node_line  # raw quote must not survive inside attrs


def test_graphml_document_parses_and_wires(spark):
    """The assembled document is well-formed XML whose edge endpoints
    all reference emitted node ids."""
    t = cached_transcripts(spark, SF_DIR).filter(
        F.col("conv_id").isin(
            [r.conv_id for r in
             cached_transcripts(spark, SF_DIR).select("conv_id")
             .distinct().limit(5).collect()]
        )
    )
    lines = [r.line for r in graphml_lines(spark, pg_nodes(t), pg_edges(t)).collect()]
    body = [x for x in lines if x not in HEADER and x not in FOOTER]
    doc = "\n".join(HEADER + sorted(body) + FOOTER)
    root = ET.fromstring(doc)
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    nodes = {el.get("id") for el in root.iter(f"{ns}node")}
    edges = list(root.iter(f"{ns}edge"))
    assert nodes and edges
    for e in edges:
        assert e.get("source") in nodes and e.get("target") in nodes
