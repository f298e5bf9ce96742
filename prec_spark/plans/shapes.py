"""SHACL-style shape inference: per-class predicate cardinalities.

After a PG -> RDF migration the first thing a consumer asks is "what
shapes did I get?" — for every rdf:type class, which predicates its
subjects carry, on how many of them, and with what cardinality.  This
is the profile a SHACL authoring tool or a migration audit starts
from (NodeShape + property minCount/maxCount candidates): a predicate
with n_with = n_subjects on a class is a mandatory-property
candidate; max_per_subject = 1 marks functional properties.

The reference audits context WELL-BEHAVEDNESS before applying rules
(contexts/model.py cites prec-c-context.ts); this operator is the
complementary post-hoc audit over the EMITTED graph, and doubles as a
data-quality gate for the KG pipeline output.

All-integer output (counts only), so the driver gate value-hashes it.
Shape at scale: one (s, p) pre-aggregation (map-side combinable), one
join against the type triples on subject (types are a small slice of
the KG), two further aggregations — no operation wider than the KG's
own subject partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


def shape_profile(
    triples: DataFrame, subject_partitioned: bool = False
) -> DataFrame:
    """(cls, pred, n_subjects, n_with, total_objs, min_per_subject,
    max_per_subject) for every (class, predicate) pair; n_subjects is
    the class size, min/max are over subjects CARRYING the predicate.
    rdf:type itself is profiled too (a subject can be multi-typed).

    One graph-sized shuffle total: the graph is hash-partitioned by
    subject ONCE (with object values projected away except on type
    rows, so literal payloads never cross the network), and every
    subject-keyed step after it — the (s, p) aggregation, the type
    slice, their join, and the distinct-subject class count — is
    co-partitioned on ``s`` and therefore exchange-free.  Only the
    final (class, predicate)-sized aggregates shuffle again, and those
    are dictionary-sized.  This replaces a plan with three graph-scale
    exchanges (the (s, p) aggregation, its re-shuffle by subject, and
    the type slice's shuffle for the sort-merge join).

    ``subject_partitioned=True`` promises the input is ALREADY
    hash-partitioned by ``s`` (the entry point's session cache is) and
    skips even that one exchange."""
    spark = triples.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    kg_s = triples.select(
        "s",
        "p",
        # class IRIs are the only object values read downstream
        F.when(F.col("p") == RDF_TYPE, F.col("o")).alias("to"),
    )
    if not subject_partitioned:
        kg_s = kg_s.repartition(parts, "s")
    types = kg_s.filter(F.col("p") == RDF_TYPE).select(
        "s", F.col("to").alias("cls")
    )
    sp = kg_s.groupBy("s", "p").agg(F.count(F.lit(1)).alias("n"))
    per_cls_pred = (
        types.join(sp, "s")
        .groupBy("cls", F.col("p").alias("pred"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_with"),
            F.sum("n").cast("long").alias("total_objs"),
            F.min("n").cast("long").alias("min_per_subject"),
            F.max("n").cast("long").alias("max_per_subject"),
        )
    )
    cls_size = types.groupBy("cls").agg(
        F.countDistinct("s").cast("long").alias("n_subjects")
    )
    return per_cls_pred.join(cls_size, "cls").select(
        "cls", "pred", "n_subjects", "n_with", "total_objs",
        "min_per_subject", "max_per_subject",
    )


def shapes_oracle_sql(triples_sql: str) -> str:
    return f"""
WITH kg AS MATERIALIZED ({triples_sql}),
types AS (SELECT s, o AS cls FROM kg WHERE p = '{RDF_TYPE}'),
sp AS (SELECT s, p, COUNT(*) AS n FROM kg GROUP BY s, p),
per AS (
  SELECT t.cls, sp.p AS pred,
         CAST(COUNT(*) AS BIGINT) AS n_with,
         CAST(SUM(sp.n) AS BIGINT) AS total_objs,
         CAST(MIN(sp.n) AS BIGINT) AS min_per_subject,
         CAST(MAX(sp.n) AS BIGINT) AS max_per_subject
  FROM types t JOIN sp ON sp.s = t.s
  GROUP BY t.cls, sp.p
),
sz AS (
  SELECT cls, CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subjects
  FROM types GROUP BY cls
)
SELECT per.cls, per.pred, sz.n_subjects, per.n_with, per.total_objs,
       per.min_per_subject, per.max_per_subject
FROM per JOIN sz ON sz.cls = per.cls
"""
