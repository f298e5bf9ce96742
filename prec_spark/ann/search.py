"""ANN search over the `embeddings` table.

* ann_bruteforce — exact cosine top-k for a query subset via a
  broadcast cross join (the baseline / ground truth). The query set is
  small (vec_id % QUERY_MOD == 0), so the join broadcasts the queries
  and the corpus streams once — the correct brute-force shape at scale.
* ann_ivf — the scale path: search only the query's coarse bucket
  (`label` = cluster assignment, standing in for an IVF partition map).
  Same output schema; recall tested against brute force.

Cosines rounded to 4 dp for cross-engine float agreement; top-k rank
ties broken deterministically by neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..dedup.embedding import _vectors, dot_col

TOP_K = 5
QUERY_MOD = 50


def _queries(vecs: DataFrame) -> DataFrame:
    return vecs.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )


def _topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-5, self excluded."""
    vecs = _vectors(spark, sf_dir)
    q = _queries(vecs)
    scored = (
        vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot_col(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")), 4
            ).alias("cosine"),
        )
    )
    return _topk(scored)


def _oracle(bucket_clause: str) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         sqrt(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                 list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, label AS q_label, emb AS qemb, nrm AS qnrm
  FROM v WHERE vec_id % {QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round(list_inner_product(v.emb, q.qemb) / (v.nrm * q.qnrm), 4) AS cosine
  FROM v JOIN q ON v.vec_id <> q.query_id {bucket_clause}
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {TOP_K}
"""


def ann_bruteforce_oracle_sql() -> str:
    return _oracle("")


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed variant: candidates restricted to the query's bucket."""
    vecs = _vectors(spark, sf_dir)
    q = _queries(vecs)
    scored = (
        vecs.join(
            F.broadcast(q),
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") == F.col("q_label")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot_col(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")), 4
            ).alias("cosine"),
        )
    )
    return _topk(scored)


def ann_ivf_oracle_sql() -> str:
    return _oracle("AND v.label = q.q_label")
