"""node2vec-style SECOND-ORDER biased walks over the KG instance graph.

plans/walks.py generates first-order (DeepWalk) walks; node2vec
(Grover & Leskovec 2016) biases each step by where the walk CAME
from: a candidate neighbor ``nb`` of the current node is weighted

    1/p  if nb == prev                (return)
    1    if nb is adjacent to prev    (stay in the neighborhood, BFS)
    1/q  otherwise                    (move outward, DFS)

With p = 2, q = 0.5 the weights are the integers (1, 2, 4) after
scaling by 2 — and INTEGER weights admit an exactly-proportional,
fully deterministic, cross-engine-portable sampler: replicate each
candidate w times with replica index j in [0, w) and take the argmin
of the per-(walk, step, nb, j) hash.  Under a uniform hash every
replica is an independent ticket, so P(pick nb) = w(nb) / sum(w) —
exact weighted sampling with zero floating point (no ln/pow, which
would not be bit-portable across engines).  Ties break on the
zero-padded hash || nb bytewise min, the same trick as
plans/walks.py.

Per step the job is: frontier-edge join (candidates, drawn from the
DEGREE-CAPPED adjacency view — see plans/walks.py:capped_adjacency
for why walks concentrate on hubs and uncapped candidate joins
explode to walks x hub-degree rows), a LEFT join against the FULL
edge list to test prev-adjacency (true adjacency, not the sampled
view), a bounded explode (<= 4 replicas), and one min aggregation —
step cost <= walks x cap x 4 regardless of skew.  The first step
degenerates to uniform automatically: prev = start = cur, so every
candidate is adjacent to prev and weighs 2.

No reference counterpart (PREC materializes graphs, it does not
sample them); built per the brief's training-data mandate alongside
plans/walks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import graph_ctes
from .walks import NBR_CAP, _md5_int, capped_adjacency, capped_cte

STEPS = 5
SAMPLE_MOD = 173
W_RETURN, W_COMMON, W_FAR = 1, 2, 4  # ∝ 1/p, 1, 1/q at p=2, q=0.5


def node2vec_walks(
    und: DataFrame,
    steps: int = STEPS,
    sample_mod: int = SAMPLE_MOD,
    cap: int = NBR_CAP,
    undc: DataFrame | None = None,
) -> DataFrame:
    """(walk, step, node): hash-seeded second-order biased walks, one
    per sampled start node.  ``und`` must be the symmetric distinct
    edge list, so dead ends cannot occur.  Pass a prebuilt (cached)
    ``undc`` to share the capped view across queries."""
    starts = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .filter(
            _md5_int(F.concat(F.lit("n2v#"), F.col("node"))) % sample_mod == 0
        )
    )
    # lazy checkpoints: lineage still truncated per step, but all steps
    # fuse into one job (see plans/walks.py)
    frontier = starts.select(
        F.col("node").alias("walk"),
        F.col("node").alias("prev"),
        F.col("node").alias("cur"),
    ).localCheckpoint(eager=False)
    out = frontier.select(
        "walk", F.lit(0).cast("long").alias("step"), F.col("cur").alias("node")
    )
    adj = und.select(
        F.col("src").alias("prev"), F.col("dst").alias("nb"),
        F.lit(1).alias("is_common"),
    )
    if undc is None:
        undc = capped_adjacency(und, cap).localCheckpoint()
    for k in range(1, steps + 1):
        cand = frontier.join(undc, frontier["cur"] == undc["src"]).select(
            "walk", "prev", "cur", F.col("dst").alias("nb")
        )
        if k == 1:
            # prev = cur at the first step, and every candidate comes
            # from undc(cur) ⊆ N(cur) = N(prev), so the prev-adjacency
            # test is vacuously true: weights are W_RETURN for the
            # self-return candidate and W_COMMON otherwise — the
            # degenerate-to-uniform case the docstring describes, now
            # WITHOUT paying the edge-list join for it (one fewer
            # full-edge-probe join per corpus; values identical, and
            # the oracle's join computes the same weights)
            wgt = F.when(
                F.col("nb") == F.col("prev"), F.lit(W_RETURN)
            ).otherwise(F.lit(W_COMMON))
            cand = cand.withColumn("wgt", wgt)
        else:
            cand = cand.join(adj, ["prev", "nb"], "left").withColumn(
                "wgt",
                F.when(F.col("nb") == F.col("prev"), F.lit(W_RETURN))
                .when(F.col("is_common").isNotNull(), F.lit(W_COMMON))
                .otherwise(F.lit(W_FAR)),
            )
        cand = cand.withColumn(
            "j", F.explode(F.sequence(F.lit(0), F.col("wgt") - 1))
        )
        h = _md5_int(
            F.concat(
                F.lit("n2v#"), F.col("walk"), F.lit(f"#{k}#"), F.col("nb"),
                F.lit("#"), F.col("j").cast("string"),
            )
        )
        pick = F.concat(F.lpad(h.cast("string"), 10, "0"), F.col("nb"))
        frontier = (
            cand.groupBy("walk")
            # one frontier row per walk pre-join, so cur is constant
            # within the group: max == that value (mirrored in SQL)
            .agg(F.max("cur").alias("prev"), F.min(pick).alias("picked"))
            .select(
                "walk", "prev", F.expr("substring(picked, 11)").alias("cur")
            )
            .localCheckpoint(eager=False)  # truncate lineage every step
        )
        out = out.unionAll(
            frontier.select(
                "walk", F.lit(k).cast("long").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out


def node2vec_oracle_sql(
    triples_sql: str,
    steps: int = STEPS,
    sample_mod: int = SAMPLE_MOD,
    cap: int = NBR_CAP,
) -> str:
    """The identical weighted races unrolled as MATERIALIZED CTEs; the
    replica explode is a static 0..3 series filtered to j < weight."""

    def md5i(expr: str) -> str:
        return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"

    ctes = [
        capped_cte(cap),
        "series AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS s(j))",
        f"""w0 AS MATERIALIZED (
  SELECT node AS walk, node AS prev, node AS cur FROM nodes
  WHERE {md5i("'n2v#' || node")} % {sample_mod} = 0
)""",
    ]
    for k in range(1, steps + 1):
        h = md5i(f"'n2v#' || c.walk || '#{k}#' || c.nb || '#' || CAST(s.j AS VARCHAR)")
        ctes.append(
            f"""w{k} AS MATERIALIZED (
  SELECT walk, MAX(cur) AS prev,
         substr(MIN(lpad(CAST(h AS VARCHAR), 10, '0') || nb), 11) AS cur
  FROM (
    SELECT c.walk, c.cur, c.nb, {h} AS h
    FROM (
      SELECT w.walk, w.prev, w.cur, u.dst AS nb,
             CASE WHEN u.dst = w.prev THEN {W_RETURN}
                  WHEN a.src IS NOT NULL THEN {W_COMMON}
                  ELSE {W_FAR} END AS wgt
      FROM w{k - 1} w
      JOIN undc u ON u.src = w.cur
      LEFT JOIN und a ON a.src = w.prev AND a.dst = u.dst
    ) c JOIN series s ON s.j < c.wgt
  ) r GROUP BY walk
)"""
        )
    body = ",\n".join(ctes)
    union = "\nUNION ALL\n".join(
        f"SELECT walk, CAST({k} AS BIGINT) AS step, cur AS node FROM w{k}"
        for k in range(steps + 1)
    )
    return f"""
WITH {graph_ctes(triples_sql)},
{body}
{union}
"""
