"""Personalized PageRank (PPR) over the KG resource graph.

Relevance-to-a-seed-set ranking — the standard KG recommendation /
related-entity primitive (seeded random surfer: restart mass lands
ONLY on the seeds, so scores measure proximity to the seed set rather
than global centrality).  Same exact INTEGER fixed-point arithmetic
as plans/pagerank.py (commutative integer sums, floor division
identical between Spark ``div`` and DuckDB ``//``), so the driver
gate value-hashes every node's mass.

Semantics (mirrored term-for-term by the SQL oracle):

  seeds        = nodes whose first 9 bytes are '_:entity_' (the
                 canonicalized entity nodes emitted by the
                 extract->link stage; text/mentions.py:315)
  mass_0(v)    = SCALE if v in seeds else 0
  mass_k+1(v)  = (v in seeds ? BASE : 0) + sum of in-edge contribs
  contrib(u,v) = (mass(u) * 85) div (100 * outdeg(u))   per edge

3 fixed iterations like pagerank; dangling mass is not redistributed
(same simplified variant).  Scale shape identical to pagerank: per
iteration one join on src + one aggregation on dst, rank frame stays
node-sized, edge list localCheckpointed/cached once by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import BASE, DAMP_DEN, DAMP_NUM, ITERS, SCALE

SEED_PREFIX = "_:entity_"


def _is_seed(col: F.Column) -> F.Column:
    return F.substring(col, 1, len(SEED_PREFIX)) == SEED_PREFIX


def ppr_iterate(
    ed: DataFrame, nodes: DataFrame, iters: int = ITERS
) -> DataFrame:
    """(node, mass) after ``iters`` seed-restarted iterations; same
    (ed, nodes) inputs as pagerank_iterate (pagerank_graph output)."""
    seeded = nodes.withColumn("is_seed", _is_seed(F.col("node")))
    pr = seeded.select(
        "node",
        F.when(F.col("is_seed"), F.lit(SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mass"),
    )
    for _ in range(iters):
        contrib = (
            ed.join(pr, ed["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(mass * {DAMP_NUM}) div ({DAMP_DEN} * deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        pr = seeded.join(contrib, "node", "left").select(
            "node",
            (
                F.when(F.col("is_seed"), F.lit(BASE)).otherwise(F.lit(0))
                + F.coalesce("in_mass", F.lit(0))
            )
            .cast("long")
            .alias("mass"),
        )
    return pr


def ppr_iterate_ids(
    ids: DataFrame, edsl: DataFrame, iters: int = ITERS
) -> DataFrame:
    """(node, mass) — the identical seed-restarted recurrence as
    ppr_iterate, over the encoded graph (pagerank_encode output, whose
    ``is_seed``/``sseed`` flags mark the '_:entity_' restart set)."""
    from .pagerank import _rank_iterate_ids

    return _rank_iterate_ids(ids, edsl, iters, personalized=True)


def ppr_oracle_sql(triples_sql: str, iters: int = ITERS) -> str:
    """The identical seed-restarted recurrence as unrolled CTEs."""
    seed = f"substr(n.node, 1, {len(SEED_PREFIX)}) = '{SEED_PREFIX}'"
    iter_ctes = []
    for k in range(1, iters + 1):
        iter_ctes.append(
            f"""pr{k} AS MATERIALIZED (
  SELECT n.node,
         CAST(CASE WHEN {seed} THEN {BASE} ELSE 0 END
              + COALESCE(c.m, 0) AS BIGINT) AS mass
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM((p.mass * {DAMP_NUM}) // ({DAMP_DEN} * e.deg)) AS m
    FROM ed e JOIN pr{k - 1} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON n.node = c.node
)"""
        )
    ctes = ",\n".join(iter_ctes)
    return f"""
WITH kg AS ({triples_sql}),
edges AS (SELECT s AS src, o AS dst FROM kg WHERE o NOT LIKE '"%'),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  ) u
),
pr0 AS (
  SELECT n.node,
         CAST(CASE WHEN {seed} THEN {SCALE} ELSE 0 END AS BIGINT) AS mass
  FROM nodes n
),
{ctes}
SELECT node, mass FROM pr{iters}
"""
