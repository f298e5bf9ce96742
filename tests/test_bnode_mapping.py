"""Blank-node -> IRI mapping (prec:mapBlankNodesToPrefix) at scale.

Round-1 ADVICE: the nested-occurrence remap used a driver-side
collect() + one giant regex. It is now a distributed explode / join /
fold pass; this test drives it with 10^5 blank nodes, far beyond what
a driver-side alternation regex should ever see.
Reference semantics: blankNodeMapping, prec-c/index.ts:82-110.
"""

from pyspark.sql import functions as F

from prec_spark.precc.apply import A, _apply_bnode_mapping

TYPE_IRI = "http://test/T"
PREFIX = "http://ex/i/"


def test_nested_bnode_mapping_100k(spark):
    n = 100_000
    base = spark.range(n).select(F.concat(F.lit("_:n"), F.col("id")).alias("bn"))
    typing = base.select(
        F.col("bn").alias("s"), F.lit(A).alias("p"), F.lit(f"<{TYPE_IRI}>").alias("o")
    )
    # RDF-star nested occurrences: two bnodes per term string, one of
    # which (_:n0) is a proper prefix of many others (_:n01, _:n0999...)
    nested = base.select(
        F.concat(F.lit("<< "), "bn", F.lit(" <http://p> _:n0 >>")).alias("s"),
        F.lit("<http://m>").alias("p"),
        F.lit('"x"').alias("o"),
    )
    q = typing.unionByName(nested)
    out = _apply_bnode_mapping(spark, q, {TYPE_IRI: PREFIX}).cache()

    # every bnode occurrence (top-level and nested) was rewritten
    assert out.filter(F.col("s").contains("_:") | F.col("o").contains("_:")).count() == 0
    assert out.count() == 2 * n

    row = out.filter(F.col("s").startswith(f"<< <{PREFIX}n123> ")).collect()
    assert len(row) == 1
    assert row[0].s == f"<< <{PREFIX}n123> <http://p> <{PREFIX}n0> >>"


def test_mapping_leaves_unrelated_terms(spark):
    q = spark.createDataFrame(
        [
            ("_:a", A, f"<{TYPE_IRI}>"),
            ("_:other", "<http://p>", '"_:a inside a literal stays"'),
        ],
        "s string, p string, o string",
    )
    out = _apply_bnode_mapping(spark, q, {TYPE_IRI: PREFIX})
    rows = {r.s: r for r in out.collect()}
    assert f"<{PREFIX}a>" in rows  # typed bnode rewritten
    # untyped bnode kept; literal content untouched (no << marker)
    assert rows["_:other"].o == '"_:a inside a literal stays"'
