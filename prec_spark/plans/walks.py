"""Deterministic random-walk corpus over the KG instance graph.

DeepWalk/node2vec-style graph embeddings train on sentences of node
ids produced by random walks; at training-data scale that generation
step is itself a big Spark job (10^9 walks over a 10^12-edge graph),
so it belongs in the engine next to the other corpus builders
(context_windows, kg_negative_samples).  The reference has no walk
generator — this is beyond-the-reference training-data surface over
the KG it does define.

Randomness is HASH-SEEDED and therefore deterministic and
cross-engine portable: at step k a walk at node ``cur`` moves to the
neighbor ``nb`` minimizing

    h = md5int('s#' walk '#' k '#' nb)        (32-bit md5 prefix)

which behaves like an independent uniform draw per (walk, step,
neighbor) but is a pure function both engines compute identically —
the repo's standard portable-hash trick (see plans/wsp.py edge
weights).  The argmin is taken over the 10-digit-zero-padded hash
concatenated with the neighbor id, so even a hash collision breaks
ties identically everywhere (bytewise string min).

Every step is one frontier-edge join + one min aggregation; the
frontier stays (walks x 1) rows.  The step cost is bounded by a
DEGREE-CAPPED adjacency view: walks attract to hubs (a hub with 10^5
edges is 10^5 times more likely to be stepped INTO), so after one step
a large share of all walks sit on the few hottest nodes and an uncapped
candidate join explodes to (walks x hub-degree) rows — measured 171 s
at sf0.1 before the cap, 1-2 s after.  Each node exposes at most
``NBR_CAP`` neighbors, chosen by a per-(node, neighbor) hash — the
standard neighbor-sampling bound from GraphSAGE/PinSAGE-style systems,
deterministic, mirrored exactly in the oracle (row_number over the
same hash order).  Walks therefore traverse a fixed uniform subsample
of each hub's edges; low-degree nodes (<= cap) are unaffected.

Walk starts are a deterministic hash sample of the node set
(``md5int('rw#' node) % sample_mod == 0``) so the corpus subsamples
uniformly without a global sort or limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import graph_ctes

STEPS = 6
SAMPLE_MOD = 101
NBR_CAP = 64


def _md5_int(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def capped_adjacency(und: DataFrame, cap: int = NBR_CAP) -> DataFrame:
    """Per-node deterministic neighbor sample: the ``cap`` edges
    minimizing md5int('cap#' src '#' dst) (ties: dst), via a window
    partitioned BY NODE — never a global sort.  The one skewed task is
    the hottest hub's own sort, O(deg log deg) once, after which every
    walk step is O(walks x cap) regardless of skew.  Every node keeps
    >= 1 neighbor, so dead ends remain impossible."""
    from pyspark.sql import Window

    h = _md5_int(F.concat(F.lit("cap#"), F.col("src"), F.lit("#"), F.col("dst")))
    key = F.concat(F.lpad(h.cast("string"), 10, "0"), F.col("dst"))
    w = Window.partitionBy("src").orderBy(key)
    return (
        und.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def capped_cte(cap: int = NBR_CAP) -> str:
    """``undc`` — the identical capped view in DuckDB SQL (appended
    after graph_ctes' ``und``)."""
    h = "CAST(('0x' || substr(md5('cap#' || src || '#' || dst), 1, 8)) AS BIGINT)"
    return f"""undc AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst, row_number() OVER (
      PARTITION BY src
      ORDER BY lpad(CAST({h} AS VARCHAR), 10, '0') || dst
    ) AS rn FROM und
  ) c WHERE rn <= {cap}
)"""


def random_walks(
    und: DataFrame,
    steps: int = STEPS,
    sample_mod: int = SAMPLE_MOD,
    cap: int = NBR_CAP,
    undc: DataFrame | None = None,
) -> DataFrame:
    """(walk, step, node): hash-seeded deterministic walks of length
    ``steps`` over the degree-capped view of the symmetric edge list
    ``und``, one walk per sampled start node (walk id = start node
    id).  Dead ends cannot occur: ``und`` is symmetric, so every node
    keeps >= 1 neighbor through the cap.  Pass a prebuilt (cached)
    ``undc`` to share the capped view across queries — the cap window
    is the dominant warm cost otherwise."""
    starts = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .filter(_md5_int(F.concat(F.lit("rw#"), F.col("node"))) % sample_mod == 0)
    )
    if undc is None:
        undc = capped_adjacency(und, cap).localCheckpoint()  # read 1x/step
    und = undc
    # lazy checkpoints throughout the loop: lineage is still truncated
    # at every step (each checkpoint materializes once, on the final
    # action), but the steps fuse into ONE job instead of paying a
    # driver round-trip per step
    frontier = starts.select(
        F.col("node").alias("walk"), F.col("node").alias("cur")
    ).localCheckpoint(eager=False)
    out = frontier.select("walk", F.lit(0).cast("long").alias("step"),
                          F.col("cur").alias("node"))
    for k in range(1, steps + 1):
        h = _md5_int(
            F.concat(
                F.lit("s#"), F.col("walk"),
                F.lit(f"#{k}#"), F.col("dst"),
            )
        )
        pick = F.concat(F.lpad(h.cast("string"), 10, "0"), F.col("dst"))
        frontier = (
            frontier.join(und, frontier["cur"] == und["src"])
            .groupBy("walk")
            .agg(F.min(pick).alias("picked"))
            .select("walk", F.expr("substring(picked, 11)").alias("cur"))
            .localCheckpoint(eager=False)  # truncate lineage every step
        )
        out = out.unionAll(
            frontier.select(
                "walk", F.lit(k).cast("long").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out


def walks_oracle_sql(
    triples_sql: str,
    steps: int = STEPS,
    sample_mod: int = SAMPLE_MOD,
    cap: int = NBR_CAP,
) -> str:
    """The identical hash-seeded steps unrolled as MATERIALIZED CTEs
    over the same instance-graph CTE prefix as components/BFS/WSP,
    stepping through the same degree-capped adjacency view."""

    def md5i(expr: str) -> str:
        return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"

    ctes = [
        capped_cte(cap),
        f"""w0 AS MATERIALIZED (
  SELECT node AS walk, node AS cur FROM nodes
  WHERE {md5i("'rw#' || node")} % {sample_mod} = 0
)""",
    ]
    for k in range(1, steps + 1):
        h = md5i(f"'s#' || w.walk || '#{k}#' || u.dst")
        ctes.append(
            f"""w{k} AS MATERIALIZED (
  SELECT walk, substr(MIN(lpad(CAST(h AS VARCHAR), 10, '0') || nb), 11) AS cur
  FROM (
    SELECT w.walk, u.dst AS nb, {h} AS h
    FROM w{k - 1} w JOIN undc u ON u.src = w.cur
  ) c GROUP BY walk
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
