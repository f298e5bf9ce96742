"""Connected components over the KG instance graph.

Beyond-the-reference analytics (sibling of plans/pagerank.py): group
KG resources into connected components over the *instance* edges —
structural relations (rdf:subject/rdf:object reification wiring,
mention links, property links with resource objects) — while
excluding the schema hub predicates (rdf:type, rdf:predicate,
rdfs:subClassOf/subPropertyOf) that would collapse the whole graph
into one component through shared class/label nodes.  On the
transcript KG the components are "conversation clusters": each
conversation's reified turn/edge subgraph, merged with other
conversations only through shared entity and tool nodes.

Algorithm: min-label propagation with pointer jumping.  Every node
starts labeled with its own id; each round does

  neighbor-min   l'(v)  = min(l(v), min_{u in N(v)} l(u))
  pointer jump   l''(v) = l'(l'(v))

Both steps are deterministic pure functions of the previous labels,
so a FIXED number of rounds is a well-defined, engine-independent
contract: the SQL oracle unrolls the identical rounds as CTEs and the
driver can hash-compare every (node, comp) row.  The jump makes the
effective propagation radius grow geometrically (a 10^4-long chain
converges in 13 rounds; the hub-shaped transcript KG in <=4), and a
loud convergence probe guarantees the fixed-round answer actually IS
the connected-components fixpoint — silent non-convergence is
impossible (the round-4 advice contract, same as simhash CC).

Labels are node-id strings; Spark's ``min``/``least`` and DuckDB's
``MIN``/``LEAST`` agree because the ids are ASCII and both engines
compare strings bytewise.

Scale notes: the symmetric edge list and node set are built once (and
session-cached by the entry point); each round is one shuffle-join +
one aggregation on the edge list plus one node-sized self-join for the
jump — never more than edge-sized intermediate state, the same
iterate-over-checkpoint shape as PageRank.  Labels are
localCheckpointed every round so the plan stays bounded (on a
real cluster: ``checkpoint()`` against a cluster-visible dir for
executor-loss resilience).  Rounds needed grow with log(diameter), so
even a 100 TB graph with million-hop chains stays in the tens of
rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"

#: schema/hub predicates excluded from the instance graph
SCHEMA_PREDICATES = (
    f"<{_RDF}type>",
    f"<{_RDF}predicate>",
    f"<{_RDFS}subClassOf>",
    f"<{_RDFS}subPropertyOf>",
)

ROUNDS = 8


def instance_edges(triples: DataFrame) -> DataFrame:
    """(src, dst) for every triple with a resource object and a
    non-schema predicate."""
    return (
        triples.filter(
            ~F.col("o").startswith('"') & ~F.col("p").isin(*SCHEMA_PREDICATES)
        ).select(F.col("s").alias("src"), F.col("o").alias("dst"))
    )


def cc_graph(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(und, nodes): the distinct symmetric edge list and the node set.
    ``und`` contains both directions of every edge, so a node's
    neighborhood is exactly the rows where it appears as ``dst``."""
    und = (
        edges.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    nodes = und.select(F.col("src").alias("node")).distinct()
    return und, nodes


def encode_nodes(nodes: DataFrame) -> DataFrame:
    """(node, nid): an ORDER-PRESERVING dense integer id per node —
    the cc_encode id assignment factored out for graphs that need only
    the id mapping (pagerank/ppr).  Distributed and deterministic: the
    sort order is total and zipWithIndex numbers rows in partition
    order."""
    spark = nodes.sparkSession
    return spark.createDataFrame(
        nodes.orderBy("node").rdd.map(lambda r: r[0]).zipWithIndex(),
        "node string, nid long",
    )


def cc_encode(und: DataFrame, nodes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ids, iund): an ORDER-PRESERVING dense integer id per node
    (sorted position, so min-by-int-id == min-by-string-id) and the
    edge list re-expressed in those ids.

    Every propagation round then shuffles 16-byte long pairs instead
    of IRI/bnode strings, and the integer label space enables the
    exact sum-based convergence test in cc_iterate.  The ids come from
    ``zipWithIndex`` over the globally sorted node set — distributed
    (no single-partition Window) and deterministic, because the sort
    order is total and zipWithIndex numbers rows in partition order."""
    ids = encode_nodes(nodes)
    s_ids = ids.select(F.col("node").alias("src"), F.col("nid").alias("isrc"))
    d_ids = ids.select(F.col("node").alias("dst"), F.col("nid").alias("idst"))
    iund = und.join(s_ids, "src").join(d_ids, "dst").select("isrc", "idst")
    return ids, iund


def _neighbor_min(iund: DataFrame, lab: DataFrame) -> DataFrame:
    mn = (
        iund.join(lab, iund["isrc"] == lab["node"])
        .groupBy(F.col("idst").alias("node"))
        .agg(F.min("lab").alias("mn"))
    )
    return lab.join(mn, "node", "left").select(
        "node", F.least("lab", F.coalesce("mn", "lab")).alias("lab")
    )


#: estimated bytes per (long, long) row in a broadcast hash relation
#: (16 B payload + hashed-relation overhead); used by the fast-path guard
_BCAST_ROW_BYTES = 48


def fits_broadcast(spark, n_rows: int) -> bool:
    """True when an ``n_rows`` node-sized (long, long) frame fits the
    session's own broadcast threshold — the same size rule Spark's
    planner applies, re-stated here because checkpointed frames carry
    no statistics for the planner to judge.  At cluster scale (10^9
    nodes) this is False and the iterate loops keep their co-partitioned
    shuffle formulation; locally it enables shuffle-free rounds."""
    try:
        raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        thresh = int(raw)
    except Exception:
        return False
    return 0 < n_rows * _BCAST_ROW_BYTES <= thresh


def selfloop_edges(ids: DataFrame, iund: DataFrame) -> DataFrame:
    """(isrc, idst, w): the integer edge list plus a zero-weight
    self-loop per node, hash-partitioned by ``idst``.

    This single shared frame makes every propagation round of
    components AND BFS one shuffle-free stage when the node frame
    broadcasts: the self-loop row carries each node's own label/distance
    into the same ``groupBy(idst)`` aggregation (no left-join back, no
    union), and because the frame is partitioned by ``idst`` the
    aggregation after a broadcast join needs no exchange at all.
    Callers should cache or checkpoint it — it is read every round."""
    spark = iund.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        iund.select("isrc", "idst", F.lit(1).cast("long").alias("w"))
        .unionAll(
            ids.select(
                F.col("nid").alias("isrc"),
                F.col("nid").alias("idst"),
                F.lit(0).cast("long").alias("w"),
            )
        )
        .repartition(parts, "idst")
    )


def cc_iterate_ids(
    ids: DataFrame,
    iund: DataFrame,
    rounds: int = ROUNDS,
    check_convergence: bool = True,
    iund_sl: DataFrame | None = None,
    n_nodes: int | None = None,
) -> DataFrame:
    """Neighbor-min + pointer-jump rounds over the integer-encoded
    graph; returns (node, comp) in the original string id space.

    With ``check_convergence`` (the default) the loop EXITS EARLY as
    soon as a round changes nothing and raises loudly if the label
    mass is still moving after ``rounds`` rounds — so the answer is
    always the true connected-components fixpoint, never a silent
    partial propagation.  Convergence is detected without any join:
    labels only ever decrease (they are mins over growing reach sets),
    so the total label sum is strictly monotone — equal sums between
    rounds is an EXACT no-change test, the integer-fixed-point trick
    that also makes the result hashable cross-engine.  (At >10^9 nodes
    switch the sum to DECIMAL to keep it overflow-free.)

    Two physically different but value-identical round shapes:

    * **broadcast fast path** (node frame fits the session's broadcast
      threshold — the guard is Spark's own size rule): each round is
      ONE shuffle-free stage over the ``idst``-partitioned self-loop
      edge frame.  The neighbor-min and the pointer jump fuse into a
      chained double broadcast lookup,

          m_{k+1}(v) = min over u in {v} ∪ N(v) of m_k(m_k(u)),

      which by induction equals the neighbor-min frame nm_k of the
      classic formulation (proof: m_0 = identity and the recurrence is
      exactly nm's); the final labels are m_R(m_R(v)), applied once
      after the loop.  The self-loop row carries v's own label, so no
      left-join back and no union — and because the edge frame is
      partitioned by ``idst``, the groupBy needs no exchange.
    * **co-partitioned fallback** (huge graphs): the original
      join + left-join + jump-join rounds, which shuffle node-sized
      frames and never require any side to fit in memory.
    """
    lab = ids.select(F.col("nid").alias("node"), F.col("nid").alias("lab"))
    if iund_sl is None:
        iund_sl = selfloop_edges(ids, iund).localCheckpoint()
    if n_nodes is None:
        n_nodes = ids.count()
    spark = ids.sparkSession
    fast = fits_broadcast(spark, n_nodes)
    prev_mass = None if check_convergence else 0
    converged = not check_convergence
    for _ in range(rounds):
        if fast:
            b1 = F.broadcast(
                lab.select(F.col("node").alias("n1"), F.col("lab").alias("l1"))
            )
            b2 = F.broadcast(
                lab.select(F.col("node").alias("n2"), F.col("lab").alias("l2"))
            )
            lab = (
                iund_sl.join(b1, iund_sl["isrc"] == F.col("n1"))
                .join(b2, F.col("l1") == F.col("n2"))
                .groupBy(F.col("idst").alias("node"))
                .agg(F.min("l2").alias("lab"))
            ).localCheckpoint(eager=not check_convergence)
        else:
            nm = _neighbor_min(iund, lab)
            # pointer jump: follow the label to ITS label.  Every label
            # is a node id (mins over node-id sets), so the self-join
            # is total.
            jump = nm.select(
                F.col("node").alias("jnode"), F.col("lab").alias("jlab")
            )
            lab = (
                nm.join(jump, nm["lab"] == jump["jnode"])
                .select("node", F.col("jlab").alias("lab"))
            ).localCheckpoint()
        # truncate lineage EVERY round (localCheckpoint above): each
        # round references the previous labels twice, so an
        # un-checkpointed chain recomputes 4^k times and its physical
        # plan grows just as fast — the labels frame is node-sized, so
        # the checkpoint is cheap at any scale (use checkpoint() on a
        # cluster-visible dir for executor-loss resilience).  On the
        # fast path the checkpoint is lazy: the mass probe below
        # materializes it in the same job.
        if check_convergence:
            mass = lab.agg(F.sum("lab")).collect()[0][0]
            if mass == prev_mass:
                converged = True
                break
            prev_mass = mass
    if not converged:
        raise RuntimeError(
            f"cc_iterate: labels still changing after {rounds} rounds — "
            "raise `rounds` (graph diameter too large for the configured "
            "round count)"
        )
    if fast:
        # the loop carried the pre-jump frame m_k; the classic loop's
        # output is m_R(m_R(v)) — apply the second lookup once
        b1 = F.broadcast(
            lab.select(F.col("node").alias("n1"), F.col("lab").alias("l1"))
        )
        lab = lab.join(b1, lab["lab"] == F.col("n1")).select(
            "node", F.col("l1").alias("lab")
        )
    return (
        lab.join(ids.select(F.col("nid").alias("node"), F.col("node").alias("node_s")), "node")
        .join(ids.select(F.col("nid").alias("lab"), F.col("node").alias("comp")), "lab")
        .select(F.col("node_s").alias("node"), "comp")
    )


def cc_iterate(
    und: DataFrame,
    nodes: DataFrame,
    rounds: int = ROUNDS,
    check_convergence: bool = True,
) -> DataFrame:
    """String-space convenience wrapper: encode to integer ids, run
    the rounds, map back."""
    ids, iund = cc_encode(und, nodes)
    return cc_iterate_ids(
        ids.localCheckpoint(), iund.localCheckpoint(), rounds, check_convergence
    )


def components(triples: DataFrame, rounds: int = ROUNDS) -> DataFrame:
    """(node, comp) for every resource in the instance graph."""
    edges = instance_edges(triples).localCheckpoint()
    und, nodes = cc_graph(edges)
    return cc_iterate(und, nodes, rounds)


def components_oracle_sql(triples_sql: str, rounds: int = ROUNDS) -> str:
    """The identical fixed-round propagation unrolled as CTEs over
    ``triples_sql`` (any SELECT producing s, p, o).

    Every per-round CTE is referenced twice by the next one, so they
    MUST be ``MATERIALIZED``: DuckDB inlines plain CTEs, which would
    expand this chain to 4^rounds copies of the base query and hang
    the planner."""
    ctes = []
    for k in range(1, rounds + 1):
        ctes.append(
            f"""nm{k} AS MATERIALIZED (
  SELECT l.node, LEAST(l.lab, COALESCE(m.mn, l.lab)) AS lab
  FROM l{k - 1} l LEFT JOIN (
    SELECT u.dst AS node, MIN(x.lab) AS mn
    FROM und u JOIN l{k - 1} x ON u.src = x.node
    GROUP BY u.dst
  ) m ON l.node = m.node
),
l{k} AS MATERIALIZED (
  SELECT a.node, b.lab FROM nm{k} a JOIN nm{k} b ON a.lab = b.node
)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {graph_ctes(triples_sql)},
l0 AS MATERIALIZED (SELECT node, node AS lab FROM nodes),
{body}
SELECT node, lab AS comp FROM l{rounds}
"""


def graph_ctes(triples_sql: str) -> str:
    """The shared kg/edges/und/nodes CTE prefix (instance graph in SQL)
    — reused by the components and BFS oracles."""
    excl = ", ".join(f"'{p}'" for p in SCHEMA_PREDICATES)
    return f"""kg AS MATERIALIZED ({triples_sql}),
edges AS (
  SELECT s AS src, o AS dst FROM kg
  WHERE o NOT LIKE '"%' AND p NOT IN ({excl})
),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
  ) u
),
nodes AS (SELECT DISTINCT src AS node FROM und)"""
