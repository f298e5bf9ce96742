"""PREC-C flagship query + reversion roundtrips, all under the oracle gate.

Round-1 gap (VERDICT.md "What's missing" #1): the driver oracle covered
only the PRSC pipeline, so the PREC-C dialect and both reversion paths
had no hard gate. This module closes it with three queries:

* ``precc_transcript_triples`` — transcript PG -> PREC-0 -> a PREC-C
  context exercising sugar rules (prec:IRIOf*), custom templates
  (prec:templatedBy + prec:produces), implicit priority
  (more-conditions-first: NEXT+sourceLabel beats NEXT), explicit
  prec:priority (holder-label rule beats property-key rule for user
  text), substitutions, preserved vocabulary, blank-node mapping
  (prec:mapBlankNodesToPrefix) and provenance stripping
  (prec:KeepProvenance false). Reference semantics:
  /root/reference/src/prec-c/index.ts:18-37 (applyContext flow),
  context-loader.ts (rule splitting / priorities / sugar).
* ``prsc_roundtrip`` — flagship PRSC apply -> revert_prsc -> flattened
  PG rows; the oracle derives the EXPECTED reverted PG directly from
  the transcripts table (prsc-reversion.ts:48-72 round-trip intent).
* ``prec0_roundtrip`` — PREC-0 expansion -> prec0_revert -> flattened
  PG rows, totality-checked (prec-0-reversion.ts).

Oracle SQL mirrors the same semantics directly over the transcripts
derivation (same approach as flagship_oracle_sql / _prec0_oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .contexts.model import PRSCCatalog
from .flagship import EX, _esc
from .pg.projection import pg_edges, pg_nodes
from .prec0 import DEFAULT_VOCAB, prec0_quads
from .prec0_revert import prec0_revert
from .precc.apply import apply_precc
from .precc.context import PreccContext
from .prsc.apply import apply_prsc
from .prsc.revert import revert_prsc
from .rdf.terms import PREC_NS, RDF_NS, RDFS_NS
from .rdf.turtle import parse_turtle
from .cached import cached_transcripts_aug
from .transcripts import transcripts_df, transcripts_oracle_sql

NODE_PREFIX = f"{EX}node/"

TRANSCRIPT_PRECC_CONTEXT = f"""
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX pgo:  <http://ii.uwb.edu.pl/pgo#>
PREFIX ex:   <{EX}>
PREFIX xsd:  <http://www.w3.org/2001/XMLSchema#>

prec:KeepProvenance prec:flagState false .
pgo:Node prec:mapBlankNodesToPrefix <{NODE_PREFIX}> .

# --- edge rules ------------------------------------------------------
# implicit priority: the more-conditions rule wins on user-source NEXT
ex:NextUserTpl a prec:EdgeTemplate ;
  prec:produces << pvar:source ex:nextAfterUser pvar:destination >> .
ex:NextUserRule a prec:EdgeRule ;
  prec:label "NEXT" ; prec:sourceLabel "user" ;
  prec:templatedBy ex:NextUserTpl .

ex:NextTpl a prec:EdgeTemplate ;
  prec:produces << pvar:source ex:next pvar:destination >> .
ex:NextRule a prec:EdgeRule ;
  prec:label "NEXT" ;
  prec:templatedBy ex:NextTpl .

# sugar rule: RDF reification with the substituted predicate
ex:inConversation prec:IRIOfEdgeLabel "IN" .

ex:UsesTpl a prec:EdgeTemplate ;
  prec:produces << pvar:source ex:usesTool pvar:destination >> .
ex:UsesRule a prec:EdgeRule ;
  prec:label "USES" ;
  prec:templatedBy ex:UsesTpl .

# --- property rules --------------------------------------------------
# explicit priority: holder-label rule (1) beats property-key rule (2)
ex:UserTextRule a prec:PropertyRule ;
  prec:label "user" ; prec:priority 1 ;
  prec:propertyIRI ex:userText .
ex:TextRule a prec:PropertyRule ;
  prec:propertyKey "text" ; prec:priority 2 ;
  prec:propertyIRI ex:textOf .

# direct-triples template keeps the PREC-0 property-key IRI (preserved)
ex:ToolPropRule a prec:PropertyRule ;
  prec:propertyKey "tool" ;
  prec:templatedBy prec:DirectTriples .

ex:convId   prec:IRIOfProperty "id" .
ex:toolName prec:IRIOfProperty "name" .

# --- node label rules ------------------------------------------------
ex:Turn         prec:IRIOfNodeLabel "Turn" .
ex:Conversation prec:IRIOfNodeLabel "Conversation" .
ex:Tool         prec:IRIOfNodeLabel "Tool" .
# role labels (user/assistant) stay on the base template -> the
# vocab/node/label/<role> IRIs and their metadata are PRESERVED.
"""


def precc_context() -> PreccContext:
    return PreccContext(parse_turtle(TRANSCRIPT_PRECC_CONTEXT))


def precc_transcript_triples(
    spark: SparkSession, sf_dir: str, transcripts: DataFrame | None = None
) -> DataFrame:
    """transcripts -> PG -> PREC-0 -> PREC-C triples (s, p, o)."""
    t = transcripts if transcripts is not None else cached_transcripts_aug(spark, sf_dir)
    quads = prec0_quads(pg_nodes(t), pg_edges(t))
    return apply_precc(spark, quads, precc_context())


# --------------------------------------------------------------------------
# oracle: the expected PREC-C output computed directly from transcripts
# --------------------------------------------------------------------------

_A = f"'<{RDF_NS}type>'"
_RLABEL = f"'<{RDFS_NS}label>'"


def _ex(n: str) -> str:
    return f"'<{EX}{n}>'"


def _node(sid_sql: str) -> str:
    return f"'<{NODE_PREFIX}' || {sid_sql} || '>'"


_TURN_SID = "'turn_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
_NEXT_SID = "'turn_' || conv_id || '_' || CAST(turn_idx + 1 AS VARCHAR)"
_CONV_SID = "'conv_' || conv_id"
_TOOL_SID = "'tool_' || tool"


def precc_oracle_sql() -> str:
    vocab = DEFAULT_VOCAB
    prec = PREC_NS
    role_label_iri = f"'<{vocab}node/label/' || role || '>'"
    tool_prop_iri = f"'<{vocab}node/property/tool/Turn-assistant>'"
    text_lit = "'\"' || " + _esc("text") + " || '\"'"
    tool_lit = "'\"' || " + _esc("tool") + " || '\"'"
    conv_lit = "'\"' || " + _esc("conv_id") + " || '\"'"
    pv_text = f"'_:propval_' || {_TURN_SID} || '_text_0'"
    pv_id = f"'_:propval_' || {_CONV_SID} || '_id_0'"
    pv_name = f"'_:propval_' || {_TOOL_SID} || '_name_0'"
    in_bn = "'_:edge_in_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"

    branches = [
        # node labels: sugar rules -> ex: IRIs; role labels -> base template
        f"SELECT {_node(_TURN_SID)} AS s, {_A} AS p, {_ex('Turn')} AS o FROM t",
        f"SELECT {_node(_TURN_SID)}, {_A}, {role_label_iri} FROM t",
        f"SELECT DISTINCT {_node(_CONV_SID)}, {_A}, {_ex('Conversation')} FROM t",
        f"SELECT DISTINCT {_node(_TOOL_SID)}, {_A}, {_ex('Tool')} FROM t WHERE tool IS NOT NULL",
        # preserved role-label vocabulary
        f"SELECT DISTINCT {role_label_iri}, {_RLABEL}, '\"' || role || '\"' FROM t",
        f"SELECT DISTINCT {role_label_iri}, {_A}, '<{prec}CreatedNodeLabel>' FROM t",
        # NEXT edges: implicit priority, user-source rule first
        f"SELECT {_node(_TURN_SID)}, {_ex('nextAfterUser')}, {_node(_NEXT_SID)} "
        "FROM t WHERE role = 'user' AND turn_idx < max_turn_idx",
        f"SELECT {_node(_TURN_SID)}, {_ex('next')}, {_node(_NEXT_SID)} "
        "FROM t WHERE role <> 'user' AND turn_idx < max_turn_idx",
        # IN edges: sugar rule -> RDF reification with substituted predicate
        f"SELECT {in_bn}, '<{RDF_NS}subject>', {_node(_TURN_SID)} FROM t",
        f"SELECT {in_bn}, '<{RDF_NS}predicate>', {_ex('inConversation')} FROM t",
        f"SELECT {in_bn}, '<{RDF_NS}object>', {_node(_CONV_SID)} FROM t",
        # USES edges
        f"SELECT {_node(_TURN_SID)}, {_ex('usesTool')}, {_node(_TOOL_SID)} FROM t WHERE tool IS NOT NULL",
        # text property: explicit priority -> userText on user turns
        f"SELECT {_node(_TURN_SID)}, {_ex('userText')}, {pv_text} FROM t WHERE role = 'user'",
        f"SELECT {_node(_TURN_SID)}, {_ex('textOf')}, {pv_text} FROM t WHERE role <> 'user'",
        f"SELECT {pv_text}, '<{RDF_NS}value>', {text_lit} FROM t",
        # conv id property (sugar)
        f"SELECT DISTINCT {_node(_CONV_SID)}, {_ex('convId')}, {pv_id} FROM t",
        f"SELECT DISTINCT {pv_id}, '<{RDF_NS}value>', {conv_lit} FROM t",
        # tool name property (sugar)
        f"SELECT DISTINCT {_node(_TOOL_SID)}, {_ex('toolName')}, {pv_name} FROM t WHERE tool IS NOT NULL",
        f"SELECT DISTINCT {pv_name}, '<{RDF_NS}value>', {tool_lit} FROM t WHERE tool IS NOT NULL",
        # tool property: DirectTriples keeps the PREC-0 key IRI
        f"SELECT {_node(_TURN_SID)}, {tool_prop_iri}, {tool_lit} FROM t WHERE tool IS NOT NULL",
        # preserved tool property-key vocabulary
        f"SELECT DISTINCT {tool_prop_iri}, {_RLABEL}, '\"tool\"' FROM t WHERE tool IS NOT NULL",
        f"SELECT DISTINCT {tool_prop_iri}, {_A}, '<{prec}CreatedPropertyKey>' FROM t WHERE tool IS NOT NULL",
    ]
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH t0 AS ({transcripts_oracle_sql()}),
t AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t0
)
SELECT DISTINCT s, p, o FROM (
{body}
) u
"""


# --------------------------------------------------------------------------
# PRSC roundtrip: apply -> revert -> flattened PG rows
# --------------------------------------------------------------------------

# Reversion is only defined for WELL-BEHAVED contexts (reference:
# prsc-reversion.ts precondition + well-behaved-check.ts). The flagship
# context is not: AssistantToolTurnRule also produces `a ex:AssistantTurn`,
# so that kappa is shared and AssistantTurnRule ends up unsigned. The
# roundtrip context differs in exactly one triple (tool turns are typed
# ex:ToolCallTurn only), making every rule uniquely signed.
REVERTIBLE_TRANSCRIPT_CONTEXT = """
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

def _flatten_pg(nodes: DataFrame, edges: DataFrame, props_is_array: bool) -> DataFrame:
    """Common flat row shape for reverted PGs:
    (kind, elem_id, src_id, dst_id, label_key, props_kv)."""
    val = (
        (lambda e: F.array_join(e.getField("value"), ","))
        if props_is_array
        else (lambda e: e.getField("value"))
    )
    props_kv = lambda df: F.array_join(  # noqa: E731
        F.transform(
            F.array_sort(F.map_entries("properties")),
            lambda e: F.concat(e.getField("key"), F.lit("="), val(e)),
        ),
        "|",
    )
    n = nodes.select(
        F.lit("node").alias("kind"),
        F.col("node_id").alias("elem_id"),
        F.lit("").alias("src_id"),
        F.lit("").alias("dst_id"),
        F.array_join("labels", "|").alias("label_key"),
        props_kv(nodes).alias("props_kv"),
    )
    e_label = (
        F.array_join("labels", "|") if "labels" in edges.columns else F.col("label")
    )
    e = edges.select(
        F.lit("edge").alias("kind"),
        F.col("edge_id").alias("elem_id"),
        "src_id",
        "dst_id",
        e_label.alias("label_key"),
        props_kv(edges).alias("props_kv"),
    )
    return n.unionByName(e)


def prsc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRSC apply -> revert_prsc -> flat PG rows (strict mode).

    The oracle is the ORIGINAL property graph (re-derived from
    transcripts in SQL), so the gate certifies apply∘revert = identity
    up to the reverted id conventions.
    """
    t = cached_transcripts_aug(spark, sf_dir)
    catalog = PRSCCatalog.from_turtle(REVERTIBLE_TRANSCRIPT_CONTEXT)
    triples, _quarantine = apply_prsc(
        spark, pg_nodes(t), pg_edges(t), catalog, unique_edge_triples=True
    )
    nodes, edges = revert_prsc(spark, triples, catalog)
    return _flatten_pg(nodes.drop("rule_idx"), edges.drop("rule_idx"), False)


def prsc_roundtrip_oracle_sql() -> str:
    text_lit = "'\"' || " + _esc("text") + " || '\"'"
    tool_lit = "'\"' || " + _esc("tool") + " || '\"'"
    conv_lit = "'\"' || " + _esc("conv_id") + " || '\"'"
    turn_bn = f"'_:' || {_TURN_SID}"
    next_bn = f"'_:' || {_NEXT_SID}"
    conv_bn = f"'_:' || {_CONV_SID}"
    tool_bn = f"'_:' || {_TOOL_SID}"
    null_s = "''"
    branches = [
        # nodes (labels = the matched PRSC rule's sorted label set)
        f"SELECT 'node' AS kind, {turn_bn} AS elem_id, {null_s} AS src_id, {null_s} AS dst_id, "
        f"'Turn|' || role AS label_key, 'text=' || {text_lit} AS props_kv FROM t WHERE tool IS NULL",
        f"SELECT 'node', {turn_bn}, {null_s}, {null_s}, 'Turn|' || role, "
        f"'text=' || {text_lit} || '|tool=' || {tool_lit} FROM t WHERE tool IS NOT NULL",
        f"SELECT DISTINCT 'node', {conv_bn}, {null_s}, {null_s}, 'Conversation', 'id=' || {conv_lit} FROM t",
        f"SELECT DISTINCT 'node', {tool_bn}, {null_s}, {null_s}, 'Tool', 'name=' || {tool_lit} FROM t WHERE tool IS NOT NULL",
        # edge-unique edges fold to _:eu_<rule_idx>_<src>_<dst>
        f"SELECT 'edge', '_:eu_5_' || {_TURN_SID} || '_' || {_NEXT_SID}, {turn_bn}, {next_bn}, 'NEXT', '' "
        "FROM t WHERE turn_idx < max_turn_idx",
        f"SELECT 'edge', '_:eu_6_' || {_TURN_SID} || '_' || {_CONV_SID}, {turn_bn}, {conv_bn}, 'IN', '' FROM t",
        f"SELECT 'edge', '_:eu_7_' || {_TURN_SID} || '_' || {_TOOL_SID}, {turn_bn}, {tool_bn}, 'USES', '' "
        "FROM t WHERE tool IS NOT NULL",
    ]
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH t0 AS ({transcripts_oracle_sql()}),
t AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t0
)
SELECT kind, elem_id, src_id, dst_id, label_key, props_kv FROM (
{body}
) u
"""


# --------------------------------------------------------------------------
# PREC-0 roundtrip: expand -> revert -> flat PG rows
# --------------------------------------------------------------------------

def prec0_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREC-0 quads -> prec0_revert (totality-checked) -> flat PG rows."""
    t = cached_transcripts_aug(spark, sf_dir)
    quads = prec0_quads(pg_nodes(t), pg_edges(t))
    # same stage-boundary shape as apply_precc: collapse the union's
    # inherited branch-partitions before the plan barrier
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nodes, edges = prec0_revert(
        spark, quads.repartition(n_parts).localCheckpoint(eager=True)
    )
    return _flatten_pg(nodes, edges, True)


def prec0_roundtrip_oracle_sql() -> str:
    text_lit = "'\"' || " + _esc("text") + " || '\"'"
    tool_lit = "'\"' || " + _esc("tool") + " || '\"'"
    conv_lit = "'\"' || " + _esc("conv_id") + " || '\"'"
    turn_bn = f"'_:' || {_TURN_SID}"
    next_bn = f"'_:' || {_NEXT_SID}"
    conv_bn = f"'_:' || {_CONV_SID}"
    tool_bn = f"'_:' || {_TOOL_SID}"
    null_s = "''"
    branches = [
        f"SELECT 'node' AS kind, {turn_bn} AS elem_id, {null_s} AS src_id, {null_s} AS dst_id, "
        f"'Turn|' || role AS label_key, 'text=' || {text_lit} AS props_kv FROM t WHERE tool IS NULL",
        f"SELECT 'node', {turn_bn}, {null_s}, {null_s}, 'Turn|' || role, "
        f"'text=' || {text_lit} || '|tool=' || {tool_lit} FROM t WHERE tool IS NOT NULL",
        f"SELECT DISTINCT 'node', {conv_bn}, {null_s}, {null_s}, 'Conversation', 'id=' || {conv_lit} FROM t",
        f"SELECT DISTINCT 'node', {tool_bn}, {null_s}, {null_s}, 'Tool', 'name=' || {tool_lit} FROM t WHERE tool IS NOT NULL",
        f"SELECT 'edge', '_:edge_next_' || conv_id || '_' || CAST(turn_idx AS VARCHAR), "
        f"{turn_bn}, {next_bn}, 'NEXT', '' FROM t WHERE turn_idx < max_turn_idx",
        f"SELECT 'edge', '_:edge_in_' || conv_id || '_' || CAST(turn_idx AS VARCHAR), "
        f"{turn_bn}, {conv_bn}, 'IN', '' FROM t",
        f"SELECT 'edge', '_:edge_uses_' || conv_id || '_' || CAST(turn_idx AS VARCHAR), "
        f"{turn_bn}, {tool_bn}, 'USES', '' FROM t WHERE tool IS NOT NULL",
    ]
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH t0 AS ({transcripts_oracle_sql()}),
t AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t0
)
SELECT kind, elem_id, src_id, dst_id, label_key, props_kv FROM (
{body}
) u
"""
