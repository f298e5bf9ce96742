"""Deterministic, leakage-safe train/val/test splits.

The one operation every training pipeline runs over every corpus.
Two properties matter at 100 TB and both are structural here:

* **Deterministic & data-independent**: the assignment is a pure hash
  of the GROUP key (md5-prefix mod 100, the same cross-engine trick
  the CMS uses) — no global sort, no sampling state, no shuffle at
  all for the assignment itself; re-running over a grown corpus never
  reassigns an existing group (stable splits across snapshots).
* **Leakage-safe grouping**: units that share information must share a
  split. Transcript TURNS from one conversation are near-duplicates of
  each other; splitting at turn level puts one conversation on both
  sides of the train/eval fence. The split key is therefore conv_id,
  and every turn inherits its conversation's assignment.

90/5/5 by bucket: <90 train, <95 val, else test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cached import cached_transcripts
from .transcripts import transcripts_oracle_sql

SPLITS = (("train", 90), ("val", 95), ("test", 100))


def split_bucket(key_col, salt: str = "split") -> "F.Column":
    """0..99 bucket from md5('{salt}#' key) — exact DuckDB twin below."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}#"), key_col.cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long")
    return h % 100


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(conv_id, bucket, split, n_turns) — one row per conversation."""
    t = cached_transcripts(spark, sf_dir)
    per_conv = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    b = split_bucket(F.col("conv_id"))
    split = (
        F.when(b < SPLITS[0][1], SPLITS[0][0])
        .when(b < SPLITS[1][1], SPLITS[1][0])
        .otherwise(SPLITS[2][0])
    )
    return per_conv.select(
        "conv_id",
        b.cast("int").alias("bucket"),
        split.alias("split"),
        "n_turns",
    )


def dataset_split_oracle_sql() -> str:
    return f"""
    WITH t AS ({transcripts_oracle_sql()}),
    per_conv AS (
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns
      FROM t GROUP BY conv_id
    ),
    b AS (
      SELECT conv_id, n_turns,
             CAST(('0x' || substr(md5('split#' || conv_id), 1, 8)) AS BIGINT)
               % 100 AS bucket
      FROM per_conv
    )
    SELECT conv_id, CAST(bucket AS INTEGER) AS bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           n_turns
    FROM b
    """
