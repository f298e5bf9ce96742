"""Named-graph (g column) end-to-end: a PRSC context whose rules
target two named graphs (prec:targetGraph engine extension; the
reference's DStar matches 4 positions, dataset/index.ts:257-271, but
its PRSC only emits default-graph triples) -> (s, p, o, g) quads ->
graph-partitioned parquet sink + TriG text sink -> parse back ->
identical quad set. Plus 4-position pattern matching (P1/J1)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from prec_spark.contexts.model import PRSCCatalog
from prec_spark.plans.bgp import DEFAULT_GRAPH_NT, match_and_bind, match_pattern
from prec_spark.prsc.apply import apply_prsc
from prec_spark.rdf.sink import write_quads_parquet, write_trig
from prec_spark.rdf.turtle import parse_turtle

A = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
EX = "http://example.org/ng/"

CONTEXT = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX ex:   <http://example.org/ng/>

ex:UserRule a prec:PRSCNodeRule ;
  prec:label "Turn", "user" ;
  prec:targetGraph ex:gUser ;
  prec:produces << pvar:self a ex:UserTurn >> .

ex:AssistantRule a prec:PRSCNodeRule ;
  prec:label "Turn", "assistant" ;
  prec:targetGraph ex:gAssistant ;
  prec:produces << pvar:self a ex:AssistantTurn >> .

ex:ConversationRule a prec:PRSCNodeRule ;
  prec:label "Conversation" ;
  prec:produces << pvar:self a ex:Conversation >> .
"""

NODES = [
    ("turn:c1:0", ["Turn", "user"], {}),
    ("turn:c1:1", ["Turn", "assistant"], {}),
    ("turn:c2:0", ["Turn", "user"], {}),
    ("conv:c1", ["Conversation"], {}),
]
NODES_SCHEMA = "node_id STRING, labels ARRAY<STRING>, properties MAP<STRING, ARRAY<STRING>>"
EDGES_SCHEMA = (
    "edge_id STRING, src_id STRING, dst_id STRING, label STRING, "
    "properties MAP<STRING, ARRAY<STRING>>"
)

G_USER, G_ASST = f"<{EX}gUser>", f"<{EX}gAssistant>"


@pytest.fixture(scope="module")
def quads(spark):
    nodes = spark.createDataFrame(NODES, NODES_SCHEMA)
    edges = spark.createDataFrame([], EDGES_SCHEMA)
    catalog = PRSCCatalog.from_turtle(CONTEXT)
    out, quarantine = apply_prsc(spark, nodes, edges, catalog, with_graphs=True)
    assert quarantine.isEmpty()
    return out.cache()


def _quad_set(df):
    return {(r.s, r.p, r.o, r.g) for r in df.collect()}


def test_rules_emit_into_their_graphs(quads):
    got = _quad_set(quads)
    assert got == {
        ("_:turn_c1_0", A, f"<{EX}UserTurn>", G_USER),
        ("_:turn_c2_0", A, f"<{EX}UserTurn>", G_USER),
        ("_:turn_c1_1", A, f"<{EX}AssistantTurn>", G_ASST),
        ("_:conv_c1", A, f"<{EX}Conversation>", DEFAULT_GRAPH_NT),
    }


def test_without_flag_raises(spark):
    nodes = spark.createDataFrame(NODES, NODES_SCHEMA)
    edges = spark.createDataFrame([], EDGES_SCHEMA)
    catalog = PRSCCatalog.from_turtle(CONTEXT)
    with pytest.raises(ValueError, match="with_graphs"):
        apply_prsc(spark, nodes, edges, catalog)


def test_four_position_match(quads):
    users = match_pattern(quads, ("?s", A, f"<{EX}UserTurn>", G_USER))
    assert {r.s for r in users.collect()} == {"_:turn_c1_0", "_:turn_c2_0"}
    # wrong graph -> no match
    assert match_pattern(quads, ("?s", A, f"<{EX}UserTurn>", G_ASST)).isEmpty()
    # graph as a variable binds it
    bound = match_and_bind(quads, [("?s", A, "?t", "?g")])
    assert {(r.t, r.g) for r in bound.collect()} == {
        (f"<{EX}UserTurn>", G_USER),
        (f"<{EX}AssistantTurn>", G_ASST),
        (f"<{EX}Conversation>", DEFAULT_GRAPH_NT),
    }


def test_trig_roundtrip(quads, tmp_path):
    out = str(tmp_path / "trig")
    write_trig(quads, out)
    text = "\n".join(
        open(p).read() for p in sorted(glob.glob(os.path.join(out, "part-*")))
    )
    assert text.startswith("@prefix")
    reparsed = {
        (q.s.nt(), q.p.nt(), q.o.nt(), q.g.nt()) for q in parse_turtle(text)
    }
    assert reparsed == _quad_set(quads)


def test_partitioned_parquet_roundtrip(quads, tmp_path, spark):
    out = str(tmp_path / "quads_pq")
    write_quads_parquet(quads, out)
    dirs = {os.path.basename(d) for d in glob.glob(f"{out}/g=*")}
    assert len(dirs) == 3  # gUser, gAssistant, default
    back = spark.read.parquet(out).select("s", "p", "o", "g")
    assert _quad_set(back) == _quad_set(quads)
    # graph-scoped read prunes to one partition directory
    one = spark.read.parquet(out).filter(F.col("g") == G_USER)
    assert one.count() == 2


# ---------------------------------------------------------------- PREC-C

PRECC_PREFIXES = """
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix pgo:  <http://ii.uwb.edu.pl/pgo#> .
@prefix prec: <http://bruy.at/prec#> .
@prefix pvar: <http://bruy.at/prec-trans#> .
@prefix :     <http://test/> .
@prefix ex:   <http://example.org/ng/>  .
"""

PRECC_CONTEXT = """
:knowsRule a prec:EdgeRule ;
  prec:label "knows" ;
  prec:targetGraph ex:gEdges ;
  prec:templatedBy prec:RdfStarUnique .

:nameRule a prec:PropertyRule ;
  prec:propertyKey "name" ;
  prec:targetGraph ex:gProps ;
  prec:templatedBy prec:DirectTriples .
"""

PRECC_INPUT = """
:e a pgo:Edge ; rdf:subject :a ; rdf:predicate :p ; rdf:object :b .
:p rdfs:label "knows" .
:a a pgo:Node . :b a pgo:Node .
:a :nk :pn1 .
:pn1 rdf:value "Alice" ; a prec:PropertyKeyValue .
:nk a prec:PropertyKey ; rdfs:label "name" .
"""


@pytest.fixture(scope="module")
def precc_quads(spark):
    from prec_spark.precc.apply import apply_precc
    from prec_spark.precc.context import PreccContext
    from prec_spark.rdf.turtle import parse_turtle as _parse

    rows = [
        (q.s.nt(), q.p.nt(), q.o.nt())
        for q in _parse(PRECC_PREFIXES + PRECC_INPUT)
    ]
    df = spark.createDataFrame(rows, "s STRING, p STRING, o STRING")
    ctx = PreccContext.from_turtle(PRECC_PREFIXES + PRECC_CONTEXT)
    assert ctx.has_target_graphs
    return apply_precc(spark, df, ctx, with_graphs=True).cache()


def test_precc_rules_emit_into_their_graphs(precc_quads):
    got = _quad_set(precc_quads)
    by_graph = {}
    for s, p, o, g in got:
        by_graph.setdefault(g, set()).add((s, p, o))
    # the edge rule's template lands wholesale in gEdges, the property
    # rule's direct triple in gProps, provenance in the default graph
    assert set(by_graph) == {
        DEFAULT_GRAPH_NT, f"<{EX}gEdges>", f"<{EX}gProps>"
    }
    T = "http://test/"
    assert (f"<{T}a>", f"<{T}p>", f"<{T}b>") in by_graph[f"<{EX}gEdges>"]
    assert by_graph[f"<{EX}gProps>"] == {(f"<{T}a>", f"<{T}nk>", '"Alice"')}
    # provenance (pgo typing) stays in the default graph
    assert any(p == A for (_s, p, _o) in by_graph[DEFAULT_GRAPH_NT])


def test_precc_without_flag_raises(spark):
    from prec_spark.precc.apply import apply_precc
    from prec_spark.precc.context import PreccContext

    df = spark.createDataFrame([("a", "b", "c")], "s STRING, p STRING, o STRING")
    ctx = PreccContext.from_turtle(PRECC_PREFIXES + PRECC_CONTEXT)
    with pytest.raises(ValueError, match="with_graphs"):
        apply_precc(spark, df, ctx)


def test_precc_trig_roundtrip(precc_quads, tmp_path):
    out = str(tmp_path / "precc_trig")
    write_trig(precc_quads, out)
    text = "\n".join(
        open(p).read() for p in sorted(glob.glob(os.path.join(out, "part-*")))
    )
    reparsed = {
        (q.s.nt(), q.p.nt(), q.o.nt(), q.g.nt()) for q in parse_turtle(text)
    }
    assert reparsed == _quad_set(precc_quads)
