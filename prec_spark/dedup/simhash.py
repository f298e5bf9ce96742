"""SimHash near-dup detection.

Uses the 16-bit majority simhash of prec_spark.text.analysis:

* dedup_simhash_groups — identical-fingerprint buckets (one shuffle on
  the fingerprint), the exact-collision first cut.
* dedup_simhash_hamming — banded Hamming-distance search: the
  fingerprint splits into BANDS bands; docs sharing any band are
  candidates; candidates are verified by full Hamming distance. With
  4 bands of 4 bits, any pair within Hamming distance 3 has <= 3
  differing bits spread over 4 bands, so AT LEAST one band matches —
  the banded search is EXACT for the <= HAMMING_MAX = 3 radius, while
  doing per-band equi-joins instead of an all-pairs product (the same
  LSH shape as MinHash banding; scale-safe at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..text.analysis import doc_fingerprint, doc_fingerprint_oracle_sql

BANDS = 4
BAND_BITS = 4
HAMMING_MAX = 3

#: SQL text evaluating the Hamming distance between two 16-char
#: bit-strings — identical syntax in Spark SQL and DuckDB.
_HAMMING_SQL = " + ".join(
    f"(CASE WHEN substr({{a}}, {i}, 1) <> substr({{b}}, {i}, 1) THEN 1 ELSE 0 END)"
    for i in range(1, 17)
)


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


def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs within Hamming distance 3,
    found exactly via 4-band LSH (see module docstring)."""
    fp = doc_fingerprint(spark, sf_dir).select("doc_id", "simhash16")
    bands = None
    for b in range(BANDS):
        part = fp.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.substring("simhash16", 1 + b * BAND_BITS, BAND_BITS).alias("key"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash16").alias("sim_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash16").alias("sim_b"))
    ham = F.expr(_HAMMING_SQL.format(a="sim_a", b="sim_b"))
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_simhash_hamming_oracle_sql() -> str:
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, substr(simhash16, {1 + b * BAND_BITS}, {BAND_BITS}) AS key FROM fp"
        for b in range(BANDS)
    )
    ham = _HAMMING_SQL.format(a="fa.simhash16", b="fb.simhash16")
    return f"""
WITH fp AS ({doc_fingerprint_oracle_sql()}),
bands AS (
{band_selects}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, {ham} AS hamming
FROM cand c
JOIN fp fa ON fa.doc_id = c.doc_a
JOIN fp fb ON fb.doc_id = c.doc_b
WHERE {ham} <= {HAMMING_MAX}
"""
