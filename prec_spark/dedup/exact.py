"""Exact (hash-groupBy) dedup: bag-of-words-normalized content hash.

One shuffle on the content hash; canonical doc = min(doc_id) per
group. At 100 TB this is the cheapest dedup pass and runs first to
shrink the corpus before LSH stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load_table
from .common import tokens_col


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, content_key, group_size, canonical_doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.sort_array(tokens_col()))).alias("content_key"),
    )
    w = Window.partitionBy("content_key")
    return keyed.select(
        "doc_id",
        "content_key",
        F.count("*").over(w).alias("group_size"),
        F.min("doc_id").over(w).alias("canonical_doc_id"),
    )


def dedup_exact_oracle_sql() -> str:
    return """
WITH keyed AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS content_key
  FROM documents
)
SELECT doc_id, content_key,
       count(*) OVER (PARTITION BY content_key) AS group_size,
       min(doc_id) OVER (PARTITION BY content_key) AS canonical_doc_id
FROM keyed
"""
