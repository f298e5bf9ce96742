"""Cross-document repeated-span detection (sequence-level dedup).

Document-level dedup (exact/minhash/simhash families) misses the
memorization-risk case that motivated sequence-level deduplication in
"Deduplicating Training Data Makes Language Models Better" (Lee et
al. 2022): long spans repeated VERBATIM across otherwise-different
documents (boilerplate, licenses, templated text).  This operator
scores every document by how much of it is made of 8-token spans that
also appear in at least one OTHER document — the signal a training
pipeline thresholds on before sampling (within-doc repetition is a
different signal, covered by quality_repetition).

Shape at scale: explode each doc into its sliding 8-token spans,
hash each span to a 60-bit integer (15 md5 hex digits — fits BIGINT
in both engines, collision odds ~n^2/2^61), and shuffle ONLY (hash,
doc_id) pairs — never the span strings — for the distinct-doc count;
one join back + a per-doc aggregation.  The span->60-bit projection
is part of the documented semantics and is mirrored exactly by the
oracle (a colliding pair of spans would be counted as duplicates by
BOTH engines).

Documents are whitespace-pre-tokenized like the rest of text/ — see
text/analysis.py:7 (`split(text, ' ')` agrees across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_parallelism, load_table

SPAN_TOKENS = 8
RATIO_SCALE = 1_000_000


def repeated_spans(docs: DataFrame, n: int = SPAN_TOKENS) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_ratio_micro): per document,
    how many of its sliding ``n``-token spans occur in >= 2 distinct
    documents.  Docs shorter than ``n`` tokens report zeros."""
    base = ensure_parallelism(
        docs.select("doc_id", F.split("text", " ").alias("t")).filter(
            F.size("t") >= n
        )
    )
    spans = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("t") - (n - 1))).alias("i"),
        "t",
    ).select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.expr(f"slice(t, i, {n})"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    g = spans.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    per = (
        spans.join(g, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.when(F.coalesce("n_spans", F.lit(0)) == 0, F.lit(0))
        .otherwise(F.expr(f"({RATIO_SCALE} * n_dup_spans) div n_spans"))
        .cast("long")
        .alias("dup_ratio_micro"),
    )


def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repeated_spans(load_table(spark, sf_dir, "documents"))


def dedup_spans_oracle_sql(n: int = SPAN_TOKENS) -> str:
    """The identical span hashing + distinct-doc count in DuckDB
    (list_slice is 1-based inclusive; `//` mirrors Spark `div`)."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
spans AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(
             array_to_string(list_slice(t, i, i + {n - 1}), ' ')
           ), 1, 15)) AS BIGINT) AS h
  FROM (
    SELECT doc_id, t, unnest(range(1, len(t) - {n} + 2)) AS i
    FROM toks WHERE len(t) >= {n}
  ) q
),
g AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY h),
per AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans
  FROM spans s JOIN g USING (h) GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(CASE WHEN COALESCE(p.n_spans, 0) = 0 THEN 0
                 ELSE ({RATIO_SCALE} * p.n_dup_spans) // p.n_spans END
            AS BIGINT) AS dup_ratio_micro
FROM documents d LEFT JOIN per p USING (doc_id)
"""
