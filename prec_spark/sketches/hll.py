"""HyperLogLog vocabulary sketch — deterministic, hash-gateable.

Distinct-count of the corpus vocabulary in 256 registers instead of a
distinct-aggregate over every term: at 100 TB "how many distinct
tokens/urls/users" is a sketch question — the full distinct needs a
corpus-wide shuffle, the HLL needs one 256-key aggregate whose map-side
partials are already registers.

Register math, portable across engines WITHOUT bit operators:
md5(term) hex -> first 2 hex chars are the bucket (0..255), the next 6
hex chars are the 24-bit scoring word; its rank (leading zeros + 1) is
computed from STRINGS — count leading '0' hex digits, then a nibble
CASE on the first non-zero digit — so Spark and DuckDB produce
bit-identical registers (the estimator itself, a float harmonic mean,
is checked as a pytest property, not value-hashed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

P_BITS = 8     # 2 hex chars -> 256 buckets
WORD_HEX = 6   # 24-bit scoring word

#: leading zero bits of the first non-zero hex digit
_NIBBLE_LZ = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}


def _nibble_case_sql(col: str) -> str:
    ones = ", ".join(f"'{k}'" for k, v in _NIBBLE_LZ.items() if v == 1)
    twos = ", ".join(f"'{k}'" for k, v in _NIBBLE_LZ.items() if v == 2)
    return (
        f"CASE WHEN {col} = '1' THEN 3"
        f" WHEN {col} IN ({twos}) THEN 2"
        f" WHEN {col} IN ({ones}) THEN 1"
        " ELSE 0 END"
    )


def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, register) — the 256-register HLL of the corpus
    vocabulary (distinct split-on-space terms of documents.text)."""
    d = load_table(spark, sf_dir, "documents").select("text")
    terms = d.select(F.explode(F.split("text", " ")).alias("term")).distinct()
    h = terms.select(F.md5("term").alias("h")).select(
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("bucket"),
        F.expr(f"ltrim('0', substring(h, 3, {WORD_HEX}))").alias("w"),
    )
    rank = F.when(F.col("w") == "", F.lit(4 * WORD_HEX + 1)).otherwise(
        (4 * WORD_HEX - 4 * F.length("w"))
        + F.expr(_nibble_case_sql("substring(w, 1, 1)"))
        + 1
    )
    return (
        h.select("bucket", rank.cast("int").alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_registers_oracle_sql() -> str:
    return f"""
WITH terms AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS term FROM documents
),
h AS (
  SELECT CAST(('0x' || substr(md5(term), 1, 2)) AS INTEGER) AS bucket,
         ltrim(substr(md5(term), 3, {WORD_HEX}), '0') AS w
  FROM terms
),
r AS (
  SELECT bucket,
         CASE WHEN w = '' THEN {4 * WORD_HEX + 1}
              ELSE {4 * WORD_HEX} - 4 * length(w)
                   + {_nibble_case_sql("substr(w, 1, 1)")} + 1 END AS rank
  FROM h
)
SELECT bucket, CAST(max(rank) AS INTEGER) AS register
FROM r GROUP BY bucket
"""


def hll_estimate(registers: dict[int, int], m: int = 1 << P_BITS) -> float:
    """The standard HLL estimator (+ small-range linear counting),
    driver-side over the 256 collected registers."""
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -registers.get(b, 0) for b in range(m))
    est = alpha * m * m / s
    zeros = sum(1 for b in range(m) if registers.get(b, 0) == 0)
    if est <= 2.5 * m and zeros:
        import math
        return m * math.log(m / zeros)
    return est


#: shards for the merge demonstration (any partitioning works — that
#: is the point of a mergeable sketch)
MERGE_SHARDS = 4


def hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, register) — the SAME vocabulary sketch, built the way a
    cluster actually builds it: each shard of the corpus computes its
    own 256-register sketch independently, and the shard sketches are
    union-merged by element-wise MAX. HLL's merge is exact (max of
    maxes), which is what lets map-side partials, per-datacenter
    rollups, and daily sketches compose without rescanning anything.

    The driver gate pins the property end-to-end: the oracle computes
    the DIRECT single-pass sketch, so any divergence between the
    sharded-merge path and the global path breaks the hash."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % MERGE_SHARDS
    )
    terms = (
        d.select(shard.alias("shard"), F.explode(F.split("text", " ")).alias("term"))
        .distinct()  # per-shard distinct: shards dedup independently
    )
    h = terms.select(
        "shard",
        F.md5("term").alias("h"),
    ).select(
        "shard",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("bucket"),
        F.expr(f"ltrim('0', substring(h, 3, {WORD_HEX}))").alias("w"),
    )
    rank = F.when(F.col("w") == "", F.lit(4 * WORD_HEX + 1)).otherwise(
        (4 * WORD_HEX - 4 * F.length("w"))
        + F.expr(_nibble_case_sql("substring(w, 1, 1)"))
        + 1
    )
    per_shard = (
        h.select("shard", "bucket", rank.cast("int").alias("rank"))
        .groupBy("shard", "bucket")
        .agg(F.max("rank").alias("register"))
    )
    return (
        per_shard.groupBy("bucket")
        .agg(F.max("register").cast("int").alias("register"))
    )


def hll_merge_oracle_sql() -> str:
    """The direct (unsharded) sketch — merge-exactness IS the gate."""
    return hll_registers_oracle_sql()
