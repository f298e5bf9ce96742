"""Hot-key skew behavior: one conversation carrying >= 20% of all turns
(FIXTURES.md §1) must flow through the pipeline with correct results —
the salted canonicalization and AQE skew-join handling absorb it."""

from pyspark.sql import functions as F

from prec_spark.flagship import flagship_triples
from prec_spark.pg.projection import pg_edges, pg_nodes
from prec_spark.text.mentions import canonical_entities, entity_links
from prec_spark.transcripts import transcripts_df


def skewed_transcripts(spark, sf_dir):
    """Replicate one conversation's turns into a single hot conv that
    dominates the table (~25% of rows)."""
    t = transcripts_df(spark, sf_dir)
    n = t.count()
    hot = (
        t.limit(max(2, n // 3))
        .withColumn("conv_id", F.lit("conv-HOT"))
        .withColumn(
            "turn_idx",
            (F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .orderBy("ts", "text")
            ) - 1).cast("int"),
        )
    )
    return t.unionByName(hot)


def test_skewed_pipeline_counts(spark, sf_dir):
    t = skewed_transcripts(spark, sf_dir).cache()
    total = t.count()
    hot_n = t.filter(F.col("conv_id") == "conv-HOT").count()
    assert hot_n / total >= 0.2

    nodes, edges = pg_nodes(t), pg_edges(t)
    # one conversation node for the hot conv; NEXT edges = turns - 1
    assert nodes.filter(F.col("node_id") == "conv:conv-HOT").count() == 1
    next_hot = edges.filter(
        (F.col("label") == "NEXT") & F.col("src_id").startswith("turn:conv-HOT")
    ).count()
    assert next_hot == hot_n - 1

    triples = flagship_triples(spark, sf_dir, transcripts=t)
    # per-turn typing triple exists for every hot turn
    hot_typing = triples.filter(
        F.col("s").startswith("_:turn_conv-HOT_")
        & (F.col("p") == "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>")
    ).count()
    assert hot_typing >= hot_n  # tool turns get 2 typing triples

    # salted canonicalization: mention totals match the link count
    links_n = entity_links(spark, sf_dir, t).count()
    canon = canonical_entities(spark, sf_dir, t)
    assert canon.agg(F.sum("n_mentions")).collect()[0][0] == links_n
