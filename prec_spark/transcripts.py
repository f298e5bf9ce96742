"""Deterministic synthetic `transcripts` table.

BASELINE.json `input_hint` fixes the input shape:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

There is no transcripts parquet in /root/testdata, so we derive one
deterministically from the driver-generated `lineitem` table: each
order is a conversation, each lineitem a turn. The SAME derivation is
expressed twice — once with the DataFrame API (Spark side) and once as
ANSI SQL (DuckDB oracle) — so the driver's side-by-side correctness
check covers it. Every expression is chosen to evaluate identically in
both engines (integer modulo, string concat of ints, row_number over a
total order).

Entity mentions ("Ann", "Dan", ... — the cast of the reference's own
test fixtures, /root/reference/data/ex2_annlikesdan1.json and
data/ex1_potus.json) are embedded in `text` so the extraction /
linking stages have ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .session import load_table

#: Fixed entity dictionary (ground truth for mention detection).
ENTITIES = ["Ann", "Dan", "Biden", "Teresa", "Marcel", "Joseph", "Nadia", "Omar"]

#: Tool names cycled over tool turns.
TOOLS = ["search", "calculator", "browser"]


def _case_sql(expr: str, values: list[str]) -> str:
    """CASE <expr> WHEN i THEN value[i] ... END (shared SQL text)."""
    whens = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE {expr} % {len(values)} {whens} END"


def transcripts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side transcripts derivation (DataFrame API).

    One conversation per order; turn order = the full lineitem sort
    key (l_linenumber alone is NOT unique within an order in the
    driver-generated data, so row_number needs the complete tuple for a
    deterministic total order). Roles alternate user / assistant; some
    assistant turns carry a tool call.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_shipdate",
    )
    turn_idx = (F.row_number().over(w) - F.lit(1)).cast("int")

    ent1 = F.element_at(F.array(*[F.lit(e) for e in ENTITIES]),
                        (F.col("l_partkey") % len(ENTITIES) + 1).cast("int"))
    ent2 = F.element_at(F.array(*[F.lit(e) for e in ENTITIES]),
                        (F.col("l_suppkey") % len(ENTITIES) + 1).cast("int"))

    role = F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))
    is_tool_turn = (F.col("role") == "assistant") & (F.col("l_suppkey") % 4 == 0)
    tool = F.when(
        F.col("is_tool_turn"),
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]),
                     (F.col("l_suppkey") % len(TOOLS) + 1).cast("int")),
    )
    text = F.concat(
        F.col("ent1"), F.lit(" told "), F.col("ent2"),
        F.lit(" about part "), F.col("l_partkey").cast("string"),
        F.lit(" in line "), F.col("l_linenumber").cast("string"),
        F.lit("."),
    )

    return (
        li.withColumn("turn_idx", turn_idx)
        .withColumn("ent1", ent1)
        .withColumn("ent2", ent2)
        .withColumn("role", role)
        .withColumn("is_tool_turn", is_tool_turn)
        .withColumn("tool", tool)
        .withColumn("text", text)
        .select(
            F.concat(F.lit("conv-"), F.col("l_orderkey").cast("string")).alias("conv_id"),
            F.col("turn_idx"),
            F.col("role"),
            F.col("text"),
            F.col("tool"),
            F.col("l_shipdate").alias("ts"),
        )
    )


def transcripts_oracle_sql(table: str = "lineitem") -> str:
    """The SAME derivation as ANSI SQL for the DuckDB oracle."""
    ent1 = _case_sql("l_partkey", ENTITIES)
    ent2 = _case_sql("l_suppkey", ENTITIES)
    tool = _case_sql("l_suppkey", TOOLS)
    return f"""
WITH numbered AS (
  SELECT *,
    CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_shipdate) - 1 AS INT) AS turn_idx
  FROM {table}
), enriched AS (
  SELECT *,
    {ent1} AS ent1,
    {ent2} AS ent2,
    CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
  FROM numbered
)
SELECT
  'conv-' || CAST(l_orderkey AS VARCHAR) AS conv_id,
  turn_idx,
  role,
  ent1 || ' told ' || ent2 || ' about part ' || CAST(l_partkey AS VARCHAR)
       || ' in line ' || CAST(l_linenumber AS VARCHAR) || '.' AS text,
  CASE WHEN role = 'assistant' AND l_suppkey % 4 = 0 THEN {tool} END AS tool,
  l_shipdate AS ts
FROM enriched
"""
