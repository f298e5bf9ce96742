"""Project the transcripts table into a property graph.

The PG data model mirrors the reference's abstract node/edge model
(/root/reference/src/prec/graph-builder.ts:85-97, PGDefinitions.ts:4-38):

* ``nodes(node_id string, labels array<string> SORTED,
          properties map<string, array<string>>)``
* ``edges(edge_id string, src_id string, dst_id string, label string,
          properties map<string, array<string>>)``

Conventions chosen for scale + oracle portability:

* ids are deterministic strings (``turn:<conv>:<idx>``) rather than
  counters — injective, reproducible in ANSI SQL, and shuffle-friendly.
  (The reference uses in-memory counters, graph-builder.ts:158,210,246;
  correctness is up to blank-node isomorphism so any injective id works.)
* labels are kept sorted (label-SET semantics; the reference dedups,
  test/mock-pg/pg-implem.ts:84-89).
* property values are stored ALREADY term-encoded (canonical N-Triples
  literal strings, see prec_spark.rdf.terms) in an array — one element
  per value, so multi-valued properties keep reference semantics
  ("Multiple value for property" is an error in strict PRSC,
  PrscContext.ts:126-128).

Edge kinds derived from transcripts (FIXTURES.md §2): NEXT (turn i ->
turn i+1), IN (turn -> conversation node), USES (turn -> tool node).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def nt_escape_col(col: Column) -> Column:
    """N-Triples escape, matching prec_spark.rdf.terms.escape_nt."""
    col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    col = F.replace(col, F.lit('"'), F.lit('\\"'))
    col = F.replace(col, F.lit("\n"), F.lit("\\n"))
    col = F.replace(col, F.lit("\r"), F.lit("\\r"))
    col = F.replace(col, F.lit("\t"), F.lit("\\t"))
    return col


def lit_term_col(col: Column) -> Column:
    """Encode a string column as a canonical literal term string."""
    return F.concat(F.lit('"'), nt_escape_col(col), F.lit('"'))


def sanitize_id_col(col: Column) -> Column:
    """Element id -> blank-node-label-safe string (':' is not a legal
    bnode-label char; our ids use ':' as a separator)."""
    return F.replace(col, F.lit(":"), F.lit("_"))


def _turn_id(conv: Column, idx: Column) -> Column:
    return F.concat(F.lit("turn:"), conv, F.lit(":"), idx.cast("string"))


def pg_nodes(transcripts: DataFrame) -> DataFrame:
    """Nodes: one per turn, one per conversation, one per distinct tool."""
    t = transcripts
    turn_nodes = t.select(
        _turn_id(F.col("conv_id"), F.col("turn_idx")).alias("node_id"),
        F.sort_array(F.array(F.lit("Turn"), F.col("role"))).alias("labels"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("text"), F.lit("tool")),
                F.array(
                    F.array(lit_term_col(F.col("text"))),
                    F.when(F.col("tool").isNotNull(), F.array(lit_term_col(F.col("tool")))),
                ),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("properties"),
    )
    conv_nodes = t.select("conv_id").distinct().select(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("node_id"),
        F.array(F.lit("Conversation")).alias("labels"),
        F.create_map(F.lit("id"), F.array(lit_term_col(F.col("conv_id")))).alias("properties"),
    )
    tool_nodes = t.filter(F.col("tool").isNotNull()).select("tool").distinct().select(
        F.concat(F.lit("tool:"), F.col("tool")).alias("node_id"),
        F.array(F.lit("Tool")).alias("labels"),
        F.create_map(F.lit("name"), F.array(lit_term_col(F.col("tool")))).alias("properties"),
    )
    return turn_nodes.unionByName(conv_nodes).unionByName(tool_nodes)


def pg_edges(transcripts: DataFrame) -> DataFrame:
    """Edges: NEXT / IN / USES, all derived without any self-join —
    NEXT uses a window `lead` over (conv_id, turn_idx), so at scale this
    is one shuffle by conv_id (the natural partitioning key)."""
    t = transcripts
    w = Window.partitionBy("conv_id").orderBy("turn_idx")

    empty_props = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<array<string>>")
    )

    # reuse a precomputed lead when the caller's frame carries one
    # (cached_transcripts_aug computes it once at cache build); the
    # window fallback serves filtered/ad-hoc frames, where a
    # precomputed lead would be stale
    base = (
        t
        if "next_idx" in t.columns
        else t.withColumn("next_idx", F.lead("turn_idx").over(w))
    )
    next_edges = (
        base.filter(F.col("next_idx").isNotNull())
        .select(
            F.concat(F.lit("edge:next:"), F.col("conv_id"), F.lit(":"),
                     F.col("turn_idx").cast("string")).alias("edge_id"),
            _turn_id(F.col("conv_id"), F.col("turn_idx")).alias("src_id"),
            _turn_id(F.col("conv_id"), F.col("next_idx")).alias("dst_id"),
            F.lit("NEXT").alias("label"),
            empty_props.alias("properties"),
        )
    )
    in_edges = t.select(
        F.concat(F.lit("edge:in:"), F.col("conv_id"), F.lit(":"),
                 F.col("turn_idx").cast("string")).alias("edge_id"),
        _turn_id(F.col("conv_id"), F.col("turn_idx")).alias("src_id"),
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("dst_id"),
        F.lit("IN").alias("label"),
        empty_props.alias("properties"),
    )
    uses_edges = t.filter(F.col("tool").isNotNull()).select(
        F.concat(F.lit("edge:uses:"), F.col("conv_id"), F.lit(":"),
                 F.col("turn_idx").cast("string")).alias("edge_id"),
        _turn_id(F.col("conv_id"), F.col("turn_idx")).alias("src_id"),
        F.concat(F.lit("tool:"), F.col("tool")).alias("dst_id"),
        F.lit("USES").alias("label"),
        empty_props.alias("properties"),
    )
    return next_edges.unionByName(in_edges).unionByName(uses_edges)
