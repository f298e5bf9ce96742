"""Shared dedup building blocks: tokenization + shingling.

Scale note: shingling is a narrow map (no shuffle); every dedup
strategy then does exactly one shuffle on its candidate key (hash /
minhash band / simhash fingerprint) — the LSH family exists precisely
so that at 100 TB the candidate join is on a high-selectivity key
instead of an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

SHINGLE_K = 3


def tokens_col() -> Column:
    return F.split(F.col("text"), " ")


def shingles_col(k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles of `text`."""
    toks = tokens_col()
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — exploded distinct shingles, docs with >= k tokens."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.size(tokens_col()) >= SHINGLE_K)
        .select("doc_id", F.explode(shingles_col()).alias("shingle"))
    )


#: shared SQL text for the shingle CTE (DuckDB)
SHINGLES_CTE = """
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
), sh AS (
  SELECT doc_id, list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
          for i in range(1, len(tokens) - 1)]) AS shingles
  FROM toks WHERE len(tokens) >= 3
), ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
)
"""
