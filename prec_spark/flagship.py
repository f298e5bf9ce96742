"""The flagship transcript-domain PRSC context + end-to-end query.

This is the "minimum end-to-end slice" of SURVEY.md §7: transcripts ->
PG projection -> PRSC context application -> canonical triples. The
context below is the transcript-domain analog of the reference's
example contexts (FIXTURES.md §3): turn/conversation/tool node rules +
NEXT / IN / USES edge rules, exercising pvar:self / pvar:source /
pvar:destination / prec:valueOf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .contexts.model import PRSCCatalog
from .pg.projection import pg_edges, pg_nodes
from .prsc.apply import apply_prsc
from .cached import cached_transcripts, cached_transcripts_aug
from .transcripts import transcripts_df

EX = "http://example.org/transcripts/"

TRANSCRIPT_CONTEXT = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX ex:   <http://example.org/transcripts/>

ex:UserTurnRule a prec:PRSCNodeRule ;
  prec:label "Turn", "user" ;
  prec:propertyKey "text" ;
  prec:produces
    << pvar:self a ex:UserTurn >> ,
    << pvar:self ex:text "text"^^prec:valueOf >> .

ex:AssistantTurnRule a prec:PRSCNodeRule ;
  prec:label "Turn", "assistant" ;
  prec:propertyKey "text" ;
  prec:produces
    << pvar:self a ex:AssistantTurn >> ,
    << pvar:self ex:text "text"^^prec:valueOf >> .

ex:AssistantToolTurnRule a prec:PRSCNodeRule ;
  prec:label "Turn", "assistant" ;
  prec:propertyKey "text", "tool" ;
  prec:produces
    << pvar:self a ex:AssistantTurn >> ,
    << pvar:self a ex:ToolCallTurn >> ,
    << pvar:self ex:text "text"^^prec:valueOf >> ,
    << pvar:self ex:toolName "tool"^^prec:valueOf >> .

ex:ConversationRule a prec:PRSCNodeRule ;
  prec:label "Conversation" ;
  prec:propertyKey "id" ;
  prec:produces
    << pvar:self a ex:Conversation >> ,
    << pvar:self ex:convId "id"^^prec:valueOf >> .

ex:ToolRule a prec:PRSCNodeRule ;
  prec:label "Tool" ;
  prec:propertyKey "name" ;
  prec:produces
    << pvar:self a ex:Tool >> ,
    << pvar:self ex:name "name"^^prec:valueOf >> .

ex:NextRule a prec:PRSCEdgeRule ;
  prec:label "NEXT" ;
  prec:produces << pvar:source ex:next pvar:destination >> .

ex:InRule a prec:PRSCEdgeRule ;
  prec:label "IN" ;
  prec:produces << pvar:source ex:inConversation pvar:destination >> .

ex:UsesRule a prec:PRSCEdgeRule ;
  prec:label "USES" ;
  prec:produces << pvar:source ex:usesTool pvar:destination >> .
"""


def flagship_catalog() -> PRSCCatalog:
    return PRSCCatalog.from_turtle(TRANSCRIPT_CONTEXT)


def flagship_triples(
    spark: SparkSession, sf_dir: str, transcripts: DataFrame | None = None
) -> DataFrame:
    """transcripts -> PG -> PRSC triples (s, p, o).

    The transcripts DF is cached: the PG projection reads it once per
    node/edge kind (6 narrow branches), and recomputing the row_number
    window per branch dominates the plan otherwise (2x wall measured
    at sf0.1)."""
    t = (
        transcripts
        if transcripts is not None
        else cached_transcripts_aug(spark, sf_dir)
    )
    nodes, edges = pg_nodes(t), pg_edges(t)
    # unique_edge_triples: the projection guarantees no two edges share
    # (src, dst, label) — NEXT/IN/USES are keyed by (conv, turn)
    triples, _quarantine = apply_prsc(
        spark, nodes, edges, flagship_catalog(), unique_edge_triples=True
    )
    return triples


# --------------------------------------------------------------------------
# DuckDB oracle: the SAME semantics in ANSI SQL over the same parquet.
# Term building mirrors prec_spark.rdf.terms / prsc.apply exactly.
# --------------------------------------------------------------------------

def _esc(col: str) -> str:
    """N-Triples escape chain in SQL (matches escape_nt)."""
    out = col
    for raw, esc in [("\\", "\\\\"), ('"', '\\"'), (chr(10), "\\n"), (chr(13), "\\r"), (chr(9), "\\t")]:
        out = f"replace({out}, '{raw}', '{esc}')"
    return out


def flagship_oracle_sql() -> str:
    from .transcripts import transcripts_oracle_sql

    turn_bn = "'_:turn_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
    conv_bn = "'_:conv_' || conv_id"
    tool_bn = "'_:tool_' || tool"
    text_lit = "'\"' || " + _esc("text") + " || '\"'"
    tool_lit = "'\"' || " + _esc("tool") + " || '\"'"
    conv_lit = "'\"' || " + _esc("conv_id") + " || '\"'"

    a = "'<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>'"

    def ex(n: str) -> str:
        return f"'<{EX}{n}>'"

    return f"""
WITH t0 AS ({transcripts_oracle_sql()}),
t AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t0
)
SELECT DISTINCT s, p, o FROM (
  -- turn typing
  SELECT {turn_bn} AS s, {a} AS p,
         CASE WHEN role = 'user' THEN {ex('UserTurn')} ELSE {ex('AssistantTurn')} END AS o
  FROM t
  UNION ALL
  SELECT {turn_bn}, {a}, {ex('ToolCallTurn')} FROM t WHERE tool IS NOT NULL
  UNION ALL
  -- turn text
  SELECT {turn_bn}, {ex('text')}, {text_lit} FROM t
  UNION ALL
  -- tool name on tool-call turns
  SELECT {turn_bn}, {ex('toolName')}, {tool_lit} FROM t WHERE tool IS NOT NULL
  UNION ALL
  -- conversation nodes
  SELECT DISTINCT {conv_bn}, {a}, {ex('Conversation')} FROM t
  UNION ALL
  SELECT DISTINCT {conv_bn}, {ex('convId')}, {conv_lit} FROM t
  UNION ALL
  -- tool nodes
  SELECT DISTINCT {tool_bn}, {a}, {ex('Tool')} FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT DISTINCT {tool_bn}, {ex('name')}, {tool_lit} FROM t WHERE tool IS NOT NULL
  UNION ALL
  -- NEXT edges (edge-unique template: src -> dst)
  SELECT {turn_bn}, {ex('next')},
         '_:turn_' || conv_id || '_' || CAST(turn_idx + 1 AS VARCHAR)
  FROM t WHERE turn_idx < max_turn_idx
  UNION ALL
  -- IN edges
  SELECT {turn_bn}, {ex('inConversation')}, {conv_bn} FROM t
  UNION ALL
  -- USES edges
  SELECT {turn_bn}, {ex('usesTool')}, {tool_bn} FROM t WHERE tool IS NOT NULL
) u
"""
