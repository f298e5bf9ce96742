"""Count-min sketch heavy hitters — deterministic, hash-gateable.

A CMS answers "how often does term t appear?" in O(depth*width) space
over an unbounded stream: depth independent hash rows, each counting
into width buckets; the point estimate is the min across rows (always
an over-estimate, biased by collisions). At 100 TB this is the standard
way to get frequent-token / hot-key statistics without a full-term
aggregation: the sketch build is one explode + one 4096-key hash
aggregate (map-side partial combine collapses almost everything before
the shuffle), versus a groupBy over hundreds of billions of distinct
terms.

Portability: each row's hash is the first 8 hex chars of
md5(term '#' j) parsed as an integer, mod width — Spark (conv(substr(
md5(..)))) and DuckDB ('0x' || substr(md5(..))) compute the identical
value, so sketch contents AND estimates hash-gate cross-engine. The
whole pipeline is JVM expressions; no Python UDF.

Tokenization is the repo convention (split on a single space), the
same contract tfidf_rank / token_counts gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

DEPTH = 4
WIDTH = 1024
TOP_K = 20


def _bucket(term: Column, j: int) -> Column:
    """Row-j CMS bucket for a term (exact DuckDB twin in the oracle)."""
    h = F.conv(
        F.substring(F.md5(F.concat(term, F.lit(f"#{j}"))), 1, 8), 16, 10
    ).cast("long")
    return (h % WIDTH).alias(f"b{j}")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("text")
    return d.select(F.explode(F.split("text", " ")).alias("term"))


def cms_sketch_df(toks: DataFrame) -> DataFrame:
    """(j, bucket, cnt) — the full depth x width counter table."""
    buckets = toks.select(*[_bucket(F.col("term"), j) for j in range(DEPTH)])
    return (
        buckets.select(
            F.posexplode(F.array(*[f"b{j}" for j in range(DEPTH)]))
            .alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K true-frequency terms with their CMS point estimates.

    Emitting BOTH the exact count and the sketch estimate gates the
    whole sketch: the estimate is min-over-rows of the counter each
    row's hash lands on, so one wrong bucket, one lost token, or one
    collision-handling difference changes the value hash. (est >= true
    always holds — a pinned property test, not assumed here.)
    """
    toks = _tokens(spark, sf_dir)
    sketch = cms_sketch_df(toks)

    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("term"))
        .limit(TOP_K)
    )
    probes = top.select(
        "term", "true_cnt",
        F.posexplode(
            F.array(*[_bucket(F.col("term"), j) for j in range(DEPTH)])
        ).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("term", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_heavy_hitters_oracle_sql() -> str:
    js = ", ".join(str(j) for j in range(DEPTH))
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
hashed AS (
  SELECT term, j,
         CAST(('0x' || substr(md5(term || '#' || CAST(j AS VARCHAR)), 1, 8))
              AS BIGINT) % {WIDTH} AS bucket
  FROM toks, (SELECT unnest([{js}]) AS j)
),
sketch AS (
  SELECT j, bucket, count(*) AS cnt FROM hashed GROUP BY j, bucket
),
top AS (
  SELECT term, count(*) AS true_cnt FROM toks GROUP BY term
  ORDER BY true_cnt DESC, term LIMIT {TOP_K}
),
probes AS (
  SELECT t.term, t.true_cnt, j,
         CAST(('0x' || substr(md5(t.term || '#' || CAST(j AS VARCHAR)), 1, 8))
              AS BIGINT) % {WIDTH} AS bucket
  FROM top t, (SELECT unnest([{js}]) AS j)
)
SELECT p.term, CAST(p.true_cnt AS BIGINT) AS true_cnt,
       CAST(min(s.cnt) AS BIGINT) AS cms_est
FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
GROUP BY p.term, p.true_cnt
"""
