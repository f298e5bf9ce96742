"""PREC-0 reversion: a PREC-0 RDF graph -> property graph.

Re-expresses /root/reference/src/prec-0/prec-0-reversion.ts
(PseudoPGBuilder.from, :94-187) as joins over the quad table, with the
same TOTALITY check: every quad in the input must be consumed by a
recognized PREC-0 pattern, otherwise the graph is not (exactly) a
PREC-0 graph and reversion fails (cli_.ts:424-427).

Together with prec_spark.prec0.prec0_quads this gives the full
PG -> PREC-0 -> PG round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .prec0 import PGO_EDGE, PGO_NODE, RDF_TYPE, RDFS_LABEL, RDFS_SUBCLASSOF
from .rdf.terms import PREC_NS, RDF_NS


class Prec0ReversionError(Exception):
    pass


def _unquote(col):
    """'"label"' -> label (labels are plain string literals)."""
    return F.regexp_extract(col, r'^"(.*)"$', 1)


def prec0_revert(
    spark: SparkSession, quads: DataFrame, strict: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Returns (nodes, edges) in the standard PG schema:
    nodes(node_id, labels sorted, properties map<string,array<string>>),
    edges(edge_id, src_id, dst_id, label, properties)."""
    q = quads.select("s", "p", "o").dropDuplicates(["s", "p", "o"]).cache()
    prec = f"<{PREC_NS}%s>"
    rdfv = f"<{RDF_NS}value>"

    if strict:
        # precondition: the four PREC-0 element types must be disjoint
        # (prec-0-reversion.ts:104-106)
        from .plans.audit import are_disjoint_types

        if not are_disjoint_types(
            q, [PGO_NODE, PGO_EDGE, prec % "PropertyKey", prec % "PropertyKeyValue"]
        ):
            raise Prec0ReversionError(
                "The detected types are not disjoint: this is not a PREC-0 graph"
            )

    node_ids = q.filter((F.col("p") == RDF_TYPE) & (F.col("o") == PGO_NODE)).select(
        F.col("s").alias("node_id")
    )
    edge_ids = q.filter((F.col("p") == RDF_TYPE) & (F.col("o") == PGO_EDGE)).select(
        F.col("s").alias("edge_id")
    )

    labels = q.filter(F.col("p") == RDFS_LABEL).select(
        F.col("s").alias("iri"), _unquote(F.col("o")).alias("label")
    )

    # ---- node labels: (n a L) where L has an rdfs:label ---------------
    typing = q.filter(F.col("p") == RDF_TYPE).select(
        F.col("s").alias("node_id"), F.col("o").alias("type_iri")
    )
    node_labels = (
        node_ids.join(typing, "node_id")
        .join(labels, F.col("type_iri") == F.col("iri"), "inner")
        .groupBy("node_id")
        .agg(F.sort_array(F.collect_set("label")).alias("labels"))
    )

    # ---- properties (on nodes and edges) -------------------------------
    prop_keys = q.filter(
        (F.col("p") == RDF_TYPE) & (F.col("o") == prec % "PropertyKey")
    ).select(F.col("s").alias("pk")).distinct()
    prop_inst = q.join(prop_keys, q["p"] == prop_keys["pk"]).select(
        F.col("s").alias("holder"), F.col("pk"), F.col("o").alias("pv")
    )
    values = q.filter(F.col("p") == rdfv).select(
        F.col("s").alias("pv2"), F.col("o").alias("raw_value")
    )
    # rdf lists -> "(e1 e2 ...)" encoded array values
    firsts = q.filter(F.col("p") == f"<{RDF_NS}first>").select(
        F.col("s").alias("ln"), F.col("o").alias("item")
    )
    rests = q.filter(F.col("p") == f"<{RDF_NS}rest>").select(
        F.col("s").alias("ln2"), F.col("o").alias("nxt")
    )
    chains = _flatten_lists(firsts, rests)

    prop_named = prop_inst.join(labels, prop_inst["pk"] == labels["iri"]).select(
        "holder", "pk", "pv", F.col("label").alias("key")
    )
    with_vals = prop_named.join(values, F.col("pv") == F.col("pv2"), "inner")
    list_vals = (
        chains.groupBy("head")
        .agg(F.concat(F.lit("("),
                      F.array_join(F.sort_array(F.collect_list(F.struct("pos", "item")))
                                   .cast("array<struct<pos:int,item:string>>")
                                   .getField("item"), " "),
                      F.lit(")")).alias("list_value"))
    )
    with_vals = with_vals.join(
        list_vals, with_vals["raw_value"] == list_vals["head"], "left"
    ).withColumn("value", F.coalesce("list_value", "raw_value"))

    props = with_vals.groupBy("holder", "key").agg(
        F.collect_list("value").alias("vals")
    ).groupBy("holder").agg(
        F.map_from_entries(F.collect_list(F.struct("key", F.col("vals")))).alias(
            "properties"
        )
    )

    empty_props = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<array<string>>")
    )

    nodes = (
        node_ids.join(node_labels, "node_id", "left")
        .join(props, node_ids["node_id"] == props["holder"], "left")
        .select(
            "node_id",
            F.coalesce("labels", F.array().cast("array<string>")).alias("labels"),
            F.coalesce("properties", empty_props).alias("properties"),
        )
    )

    # ---- edges -----------------------------------------------------------
    spo = (
        q.filter(
            F.col("p").isin(
                f"<{RDF_NS}subject>", f"<{RDF_NS}predicate>", f"<{RDF_NS}object>"
            )
        )
        .groupBy("s")
        .agg(
            F.max(F.when(F.col("p") == f"<{RDF_NS}subject>", F.col("o"))).alias("src_id"),
            F.max(F.when(F.col("p") == f"<{RDF_NS}predicate>", F.col("o"))).alias("pred"),
            F.max(F.when(F.col("p") == f"<{RDF_NS}object>", F.col("o"))).alias("dst_id"),
        )
    )
    edges = (
        edge_ids.join(spo, edge_ids["edge_id"] == spo["s"]).drop("s")
        .join(labels, F.col("pred") == F.col("iri"), "left")
        .join(props, F.col("edge_id") == props["holder"], "left")
        .select(
            "edge_id",
            "src_id",
            "dst_id",
            F.col("label"),
            F.coalesce("properties", empty_props).alias("properties"),
        )
    )

    if strict:
        _totality_check(q, prec, prop_keys, chains)

    return nodes, edges


def _flatten_lists(firsts: DataFrame, rests: DataFrame) -> DataFrame:
    """(head, node, pos, item) for every rdf list."""
    heads = firsts.join(
        rests.select(F.col("nxt").alias("ln")), on="ln", how="leftanti"
    ).select(F.col("ln").alias("head"))
    frontier = heads.select("head", F.col("head").alias("node"), F.lit(0).alias("pos"))
    all_nodes = frontier
    for _ in range(64):
        nxt = (
            frontier.join(rests, frontier["node"] == rests["ln2"])
            .filter(~F.col("nxt").endswith("#nil>"))
            .select("head", F.col("nxt").alias("node"), (F.col("pos") + 1).alias("pos"))
        )
        if nxt.isEmpty():
            break
        all_nodes = all_nodes.unionByName(nxt)
        frontier = nxt
    return all_nodes.join(
        firsts.withColumnRenamed("ln", "node"), on="node"
    ).select("head", "node", "pos", "item")


def _totality_check(q, prec, prop_keys, chains):
    """Every input quad must be a recognized PREC-0 pattern."""
    rdfv = f"<{RDF_NS}value>"
    recognized_preds = [
        RDF_TYPE,
        RDFS_LABEL,
        RDFS_SUBCLASSOF,
        rdfv,
        f"<{RDF_NS}subject>",
        f"<{RDF_NS}predicate>",
        f"<{RDF_NS}object>",
        f"<{RDF_NS}first>",
        f"<{RDF_NS}rest>",
    ]
    known_type_objs = [
        PGO_NODE,
        PGO_EDGE,
        prec % "PropertyKey",
        prec % "CreatedPropertyKey",
        prec % "PropertyKeyValue",
        prec % "CreatedNodeLabel",
        prec % "CreatedEdgeLabel",
    ]
    leftovers = q.filter(~F.col("p").isin(*recognized_preds))
    leftovers = leftovers.join(prop_keys, q["p"] == prop_keys["pk"], "leftanti")
    n = leftovers.count()
    if n:
        sample = [f"{r.s} {r.p} {r.o}" for r in leftovers.limit(3).collect()]
        raise Prec0ReversionError(
            f"{n} quads are not part of the PREC-0 encoding, e.g. {sample}"
        )
    bad_types = q.filter(
        (F.col("p") == RDF_TYPE)
        & ~F.col("o").isin(*known_type_objs)
        & ~F.col("o").rlike("^<http://www.example.org/vocab/")
    )
    # label IRIs may be any IRI carrying an rdfs:label; accept types whose
    # object has a label
    labels_iris = q.filter(F.col("p") == RDFS_LABEL).select(
        F.col("s").alias("labeled_iri")
    )
    bad_types = bad_types.join(
        labels_iris, bad_types["o"] == labels_iris["labeled_iri"], "leftanti"
    )
    n = bad_types.count()
    if n:
        raise Prec0ReversionError(f"{n} typing quads with unknown classes")
