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


def test_hot_entity_canonicalization_exact(spark, sf_dir):
    """The one-pass salted aggregation (salt = f(conv_id)) must be
    EXACT for both n_mentions and n_conversations, including under a
    hot conversation that floods one entity's mentions."""
    t = skewed_transcripts(spark, sf_dir).cache()
    links = entity_links(spark, sf_dir, t).cache()
    expected = links.groupBy("entity_id").agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("conv_id").alias("n_conversations"),
    )
    got = canonical_entities(spark, sf_dir, t).select(
        "entity_id", "n_mentions", "n_conversations"
    )
    assert got.exceptAll(expected).isEmpty() and expected.exceptAll(got).isEmpty()


def test_minhash_hot_shingle(spark, sf_dir):
    """Candidate-driven MinHash verification must stay bounded when one
    shingle appears in 50% of a 20k-doc corpus (the old shingle
    self-join would build ~10^8 intermediate rows here)."""
    from prec_spark.dedup.minhash import dedup_minhash_pairs

    n = 20_000
    docs = spark.range(n)
    # every doc: 10 private shingles + (for even ids) one global hot shingle
    shingles = docs.select(
        F.col("id").cast("string").alias("doc_id"),
        F.explode(
            F.concat(
                F.transform(
                    F.sequence(F.lit(0), F.lit(9)),
                    lambda i: F.concat(F.col("id").cast("string"), F.lit("_"), i),
                ),
                F.when(F.col("id") % 2 == 0, F.array(F.lit("HOT"))).otherwise(
                    F.array().cast("array<string>")
                ),
            )
        ).alias("shingle"),
    )
    pairs = dedup_minhash_pairs(spark, sf_dir, shingles=shingles)
    rows = pairs.collect()  # must complete quickly; sharing only HOT -> low jaccard
    assert all(r.jaccard >= 0.5 for r in rows)
    assert len(rows) == 0  # 1/21 overlap can never pass the 0.5 threshold
