"""Temporal KG: materialize the graph AS OF an event-time cutoff.

"What did the graph look like last Tuesday" is the other half of time
travel: lakehouse snapshots answer it for COMMIT time, this operator
answers it for EVENT time — rebuild the KG from only the turns whose
timestamp precedes the cutoff. Because transcript timestamps are not
monotone within a conversation, a time cut leaves GAPS in the turn
sequence, and the NEXT chain must rewire across them (turn 3's
successor may be turn 7). The Spark side gets this for free — the PG
projection's NEXT edge is a real ``lead`` window over the surviving
turns (pg/projection.py) — and the DuckDB oracle here replays the same
lead explicitly instead of the contiguous ``turn_idx + 1`` shortcut the
full-corpus flagship oracle is allowed to use.

Everything else (typing/text/tool/conversation triples, mention/entity
triples over the surviving turns) follows the flagship + mention
pipelines unchanged: the operator is one ``filter`` pushed beneath the
whole KG build, which is exactly the plan you want at 100 TB — the
time predicate reaches the parquet scan, and the pipeline never sees
dead turns.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cached import cached_transcripts
from .flagship import EX, _esc, flagship_triples
from .text.mentions import entity_triples
from .transcripts import ENTITIES, transcripts_oracle_sql

#: event-time cutoff (mid-corpus: transcripts span 1995..2001)
ASOF_CUT = datetime.datetime(1997, 1, 1)

_A = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


def kg_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, p, o): the full KG rebuilt from turns with ts < ASOF_CUT."""
    t = cached_transcripts(spark, sf_dir).filter(F.col("ts") < F.lit(ASOF_CUT))
    return flagship_triples(spark, sf_dir, transcripts=t).unionByName(
        entity_triples(spark, sf_dir, transcripts=t)
    )


def kg_asof_oracle_sql() -> str:
    turn_bn = "'_:turn_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
    next_bn = "'_:turn_' || conv_id || '_' || CAST(next_idx AS VARCHAR)"
    conv_bn = "'_:conv_' || conv_id"
    tool_bn = "'_:tool_' || tool"
    text_lit = "'\"' || " + _esc("text") + " || '\"'"
    tool_lit = "'\"' || " + _esc("tool") + " || '\"'"
    conv_lit = "'\"' || " + _esc("conv_id") + " || '\"'"
    a = f"'{_A}'"

    def ex(n: str) -> str:
        return f"'<{EX}{n}>'"

    ent_list = ", ".join(f"'{n}'" for n in ENTITIES)
    return f"""
WITH t0 AS ({transcripts_oracle_sql()}),
t AS (
  SELECT conv_id, turn_idx, role, text, tool,
         lead(turn_idx) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
         ) AS next_idx
  FROM t0 WHERE ts < TIMESTAMP '{ASOF_CUT:%Y-%m-%d %H:%M:%S}'
),
sp AS (
  SELECT conv_id, turn_idx,
         trim(split_part(text, ' told ', 1)) AS ent1,
         trim(split_part(split_part(text, ' told ', 2),
                         ' about part ', 1)) AS ent2
  FROM t
),
m AS (
  SELECT conv_id, turn_idx, ent1 AS mention FROM sp
  UNION ALL
  SELECT conv_id, turn_idx, ent2 FROM sp
),
l AS (SELECT * FROM m WHERE mention IN ({ent_list}))
SELECT DISTINCT s, p, o FROM (
  SELECT {turn_bn} AS s, {a} AS p,
         CASE WHEN role = 'user' THEN {ex('UserTurn')}
              ELSE {ex('AssistantTurn')} END AS o
  FROM t
  UNION ALL
  SELECT {turn_bn}, {a}, {ex('ToolCallTurn')} FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT {turn_bn}, {ex('text')}, {text_lit} FROM t
  UNION ALL
  SELECT {turn_bn}, {ex('toolName')}, {tool_lit} FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT DISTINCT {conv_bn}, {a}, {ex('Conversation')} FROM t
  UNION ALL
  SELECT DISTINCT {conv_bn}, {ex('convId')}, {conv_lit} FROM t
  UNION ALL
  SELECT DISTINCT {tool_bn}, {a}, {ex('Tool')} FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT DISTINCT {tool_bn}, {ex('name')}, {tool_lit}
  FROM t WHERE tool IS NOT NULL
  UNION ALL
  -- NEXT rewires across time-cut gaps: a REAL lead, not turn_idx + 1
  SELECT {turn_bn}, {ex('next')}, {next_bn} FROM t WHERE next_idx IS NOT NULL
  UNION ALL
  SELECT {turn_bn}, {ex('inConversation')}, {conv_bn} FROM t
  UNION ALL
  SELECT {turn_bn}, {ex('usesTool')}, {tool_bn} FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT '_:turn_' || conv_id || '_' || CAST(turn_idx AS VARCHAR),
         {ex('mentions')}, '_:entity_' || mention
  FROM l
  UNION ALL
  SELECT DISTINCT '_:entity_' || mention, {a}, {ex('Entity')} FROM l
  UNION ALL
  SELECT DISTINCT '_:entity_' || mention, {ex('name')}, '"' || mention || '"'
  FROM l
) u
"""
