"""pretrain_filter: the composed corpus-curation verdict.

The operators exist individually (lang_id, quality_gopher, dedup_exact,
dataset splits); a real pipeline runs them as ONE pass that decides,
per document: does it enter the training set, and if not, why. The
reason is the FIRST failing rule in pipeline order (language -> quality
-> dedup), which is also the audit trail a curation run must emit —
at 100 TB you budget storage by rejection reason, not by a bare bool.

Composition stays declarative: three DataFrame joins on doc_id over the
existing operators, so Catalyst sees one plan (shared scans, pushdown)
rather than three materialized passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets import split_bucket
from ..dedup.exact import dedup_exact, dedup_exact_oracle_sql
from .analysis import lang_id, lang_id_oracle_sql
from .quality import quality_gopher, quality_gopher_oracle_sql


def pretrain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, reason, keep, split) — training-set membership verdict."""
    lang = lang_id(spark, sf_dir).select("doc_id", "predicted_lang")
    qual = quality_gopher(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_ok")
    )
    dd = dedup_exact(spark, sf_dir).select("doc_id", "canonical_doc_id")
    j = lang.join(qual, "doc_id").join(dd, "doc_id")
    reason = (
        F.when(F.col("predicted_lang") != "en", "lang")
        .when(~F.col("q_ok"), "quality")
        .when(F.col("doc_id") != F.col("canonical_doc_id"), "duplicate")
        .otherwise("ok")
    )
    return j.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
        F.when(
            reason == "ok",
            F.when(split_bucket(F.col("doc_id"), salt="docsplit") < 90, "train")
            .when(split_bucket(F.col("doc_id"), salt="docsplit") < 95, "val")
            .otherwise("test"),
        ).otherwise(F.lit("rejected")).alias("split"),
    )


def pretrain_filter_oracle_sql() -> str:
    return f"""
WITH lang AS ({lang_id_oracle_sql()}),
q AS ({quality_gopher_oracle_sql()}),
dd AS ({dedup_exact_oracle_sql()}),
j AS (
  SELECT l.doc_id, l.predicted_lang, q.keep AS q_ok, dd.canonical_doc_id
  FROM lang l JOIN q ON l.doc_id = q.doc_id JOIN dd ON l.doc_id = dd.doc_id
),
v AS (
  SELECT doc_id,
         CASE WHEN predicted_lang <> 'en' THEN 'lang'
              WHEN NOT q_ok THEN 'quality'
              WHEN doc_id <> canonical_doc_id THEN 'duplicate'
              ELSE 'ok' END AS reason,
         CAST(('0x' || substr(md5('docsplit#' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS b
  FROM j
)
SELECT doc_id, reason, reason = 'ok' AS keep,
       CASE WHEN reason <> 'ok' THEN 'rejected'
            WHEN b < 90 THEN 'train'
            WHEN b < 95 THEN 'val'
            ELSE 'test' END AS split
FROM v
"""
