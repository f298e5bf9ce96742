"""Named-graph KG materialization (g column end-to-end).

The flagship transcript context with each rule routed to an output
graph via the `prec:targetGraph` engine extension (see
contexts/model.py — the reference's DStar stores and matches 4
positions, dataset/index.ts:257-271, but its PRSC emits only into the
default graph): turn facts split per speaker graph, edge facts into an
edges graph, shared vocabulary (conversation / tool nodes) into the
default graph. The produced (s, p, o, g) quad table feeds the
graph-partitioned parquet sink (rdf/sink.py:write_quads_parquet) and
the TriG writer; tests/test_named_graphs.py holds the two-graph golden
and the sink round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .contexts.model import PRSCCatalog
from .flagship import EX, _esc
from .pg.projection import pg_edges, pg_nodes
from .prsc.apply import apply_prsc
from .cached import cached_transcripts_aug
from .transcripts import transcripts_df

G_USER = f"<{EX}graph/user>"
G_ASSISTANT = f"<{EX}graph/assistant>"
G_EDGES = f"<{EX}graph/edges>"

NG_CONTEXT = f"""
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX ex:   <{EX}>

ex:UserTurnRule a prec:PRSCNodeRule ;
  prec:label "Turn", "user" ;
  prec:propertyKey "text" ;
  prec:targetGraph <{EX}graph/user> ;
  prec:produces
    << pvar:self a ex:UserTurn >> ,
    << pvar:self ex:text "text"^^prec:valueOf >> .

ex:AssistantTurnRule a prec:PRSCNodeRule ;
  prec:label "Turn", "assistant" ;
  prec:propertyKey "text" ;
  prec:targetGraph <{EX}graph/assistant> ;
  prec:produces
    << pvar:self a ex:AssistantTurn >> ,
    << pvar:self ex:text "text"^^prec:valueOf >> .

ex:AssistantToolTurnRule a prec:PRSCNodeRule ;
  prec:label "Turn", "assistant" ;
  prec:propertyKey "text", "tool" ;
  prec:targetGraph <{EX}graph/assistant> ;
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
  prec:targetGraph <{EX}graph/edges> ;
  prec:produces << pvar:source ex:next pvar:destination >> .

ex:InRule a prec:PRSCEdgeRule ;
  prec:label "IN" ;
  prec:targetGraph <{EX}graph/edges> ;
  prec:produces << pvar:source ex:inConversation pvar:destination >> .

ex:UsesRule a prec:PRSCEdgeRule ;
  prec:label "USES" ;
  prec:targetGraph <{EX}graph/edges> ;
  prec:produces << pvar:source ex:usesTool pvar:destination >> .
"""


def named_graph_quads(
    spark: SparkSession, sf_dir: str, transcripts: DataFrame | None = None
) -> DataFrame:
    """transcripts -> PG -> PRSC quads (s, p, o, g)."""
    t = transcripts if transcripts is not None else cached_transcripts_aug(spark, sf_dir)
    quads, _quarantine = apply_prsc(
        spark,
        pg_nodes(t),
        pg_edges(t),
        PRSCCatalog.from_turtle(NG_CONTEXT),
        unique_edge_triples=True,
        with_graphs=True,
    )
    return quads


def named_graph_oracle_sql() -> str:
    from .transcripts import transcripts_oracle_sql

    turn_bn = "'_:turn_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
    conv_bn = "'_:conv_' || conv_id"
    tool_bn = "'_:tool_' || tool"
    text_lit = "'\"' || " + _esc("text") + " || '\"'"
    tool_lit = "'\"' || " + _esc("tool") + " || '\"'"
    conv_lit = "'\"' || " + _esc("conv_id") + " || '\"'"
    a = "'<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>'"
    role_g = f"CASE WHEN role = 'user' THEN '{G_USER}' ELSE '{G_ASSISTANT}' END"

    def ex(n: str) -> str:
        return f"'<{EX}{n}>'"

    return f"""
WITH t0 AS ({transcripts_oracle_sql()}),
t AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t0
)
SELECT DISTINCT s, p, o, g FROM (
  SELECT {turn_bn} AS s, {a} AS p,
         CASE WHEN role = 'user' THEN {ex('UserTurn')} ELSE {ex('AssistantTurn')} END AS o,
         {role_g} AS g
  FROM t
  UNION ALL
  SELECT {turn_bn}, {a}, {ex('ToolCallTurn')}, '{G_ASSISTANT}' FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT {turn_bn}, {ex('text')}, {text_lit}, {role_g} FROM t
  UNION ALL
  SELECT {turn_bn}, {ex('toolName')}, {tool_lit}, '{G_ASSISTANT}' FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT DISTINCT {conv_bn}, {a}, {ex('Conversation')}, '<>' FROM t
  UNION ALL
  SELECT DISTINCT {conv_bn}, {ex('convId')}, {conv_lit}, '<>' FROM t
  UNION ALL
  SELECT DISTINCT {tool_bn}, {a}, {ex('Tool')}, '<>' FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT DISTINCT {tool_bn}, {ex('name')}, {tool_lit}, '<>' FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT {turn_bn}, {ex('next')},
         '_:turn_' || conv_id || '_' || CAST(turn_idx + 1 AS VARCHAR), '{G_EDGES}'
  FROM t WHERE turn_idx < max_turn_idx
  UNION ALL
  SELECT {turn_bn}, {ex('inConversation')}, {conv_bn}, '{G_EDGES}' FROM t
  UNION ALL
  SELECT {turn_bn}, {ex('usesTool')}, {tool_bn}, '{G_EDGES}' FROM t WHERE tool IS NOT NULL
) u
"""
