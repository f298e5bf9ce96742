"""SimHash grouping: identical-fingerprint near-dup buckets.

Uses the 16-bit majority simhash of prec_spark.text.analysis; docs
sharing a fingerprint form a bucket (one shuffle on the fingerprint).
At scale the fingerprint doubles as a locality key for banded
hamming-distance search; exact-collision grouping is the first-cut
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..text.analysis import doc_fingerprint, doc_fingerprint_oracle_sql


def dedup_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash16, bucket_size, canonical_doc_id)."""
    fp = doc_fingerprint(spark, sf_dir)
    w = Window.partitionBy("simhash16")
    return fp.select(
        "doc_id",
        "simhash16",
        F.count("*").over(w).alias("bucket_size"),
        F.min("doc_id").over(w).alias("canonical_doc_id"),
    )


def dedup_simhash_oracle_sql() -> str:
    return f"""
WITH fp AS ({doc_fingerprint_oracle_sql()})
SELECT doc_id, simhash16,
       count(*) OVER (PARTITION BY simhash16) AS bucket_size,
       min(doc_id) OVER (PARTITION BY simhash16) AS canonical_doc_id
FROM fp
"""
