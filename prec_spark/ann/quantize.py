"""Int8 embedding quantization with exact reconstruction-error gate.

Vector stores ship int8-quantized embeddings (4x smaller, SIMD
dot-products) and the pipeline that produces them needs the
quantization + its error accounting as a first-class distributed op.
Per vector: symmetric max-abs scaling

    scale = max_i |v_i|
    q_i   = round(127 * v_i / scale)        (int8 range, HALF_UP)
    dq_i  = q_i * scale / 127
    err2  = sum_i (v_i - dq_i)^2            (sequential left fold)

Cross-engine gating uses the repo's two float rules: Spark F.round
and DuckDB round() both round half away from zero on doubles (the
events cents gate), and FIXED-ASSOCIATION float chains are
bit-identical across engines (the PQ gates; ann/pq.py:18).  Every
element-wise expression here is written in the same shape on both
sides (float32 -> float64 elementwise cast first, so neither engine
mixes float/double intermediates), and the error fold
((0 + d1^2) + d2^2) + ... matches DuckDB's list_inner_product
association.  Integer outputs (code sums, floor-scaled scale/error)
make the row hashable.

Zero vectors quantize to all-zero codes with dq = 0 by definition
(the CASE guard is mirrored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_parallelism, load_table

MICRO = 1_000_000


def quantize_int8(vecs: DataFrame) -> DataFrame:
    """(vec_id, n_dims, sum_q, q_l1, scale_micro, err_micro) for every
    (vec_id, embedding array<float>) row."""
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    step1 = ensure_parallelism(vecs.select("vec_id", vd.alias("vd")))
    scale = F.array_max(F.transform(F.col("vd"), lambda x: F.abs(x)))
    step2 = step1.select("vec_id", "vd", scale.alias("scale"))

    def q_of(x):
        return F.round(F.lit(127) * x / F.col("scale"), 0)

    qv = F.when(
        F.col("scale") == 0,
        F.array_repeat(F.lit(0).cast("long"), F.size("vd")),
    ).otherwise(F.transform(F.col("vd"), lambda x: q_of(x).cast("long")))
    diff = F.when(F.col("scale") == 0, F.col("vd")).otherwise(
        F.transform(
            F.col("vd"), lambda x: x - q_of(x) * F.col("scale") / F.lit(127)
        )
    )
    step3 = step2.select(
        "vec_id", "scale", qv.alias("qv"), diff.alias("diff")
    )
    isum = lambda col: F.aggregate(  # noqa: E731 - local fold shorthand
        col, F.lit(0).cast("long"), lambda a, x: a + x
    )
    err2 = F.aggregate(
        F.col("diff"), F.lit(0.0), lambda a, x: a + x * x
    )
    return step3.select(
        "vec_id",
        F.size("qv").cast("int").alias("n_dims"),
        isum(F.col("qv")).alias("sum_q"),
        isum(F.transform(F.col("qv"), lambda x: F.abs(x))).alias("q_l1"),
        F.floor(F.lit(MICRO) * F.col("scale")).cast("long").alias("scale_micro"),
        F.floor(F.lit(MICRO) * err2).cast("long").alias("err_micro"),
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantize_int8(load_table(spark, sf_dir, "embeddings"))


def embedding_quantize_oracle_sql() -> str:
    """The identical expressions in DuckDB (list_inner_product's fold
    association == the Spark aggregate above)."""
    q = "round(127 * x / scale, 0)"
    return f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings
),
s AS (
  SELECT vec_id, vd,
         list_max(list_transform(vd, x -> abs(x))) AS scale
  FROM v
),
d AS (
  SELECT vec_id, scale,
         CASE WHEN scale = 0
              THEN list_transform(vd, x -> CAST(0 AS BIGINT))
              ELSE list_transform(vd, x -> CAST({q} AS BIGINT)) END AS qv,
         CASE WHEN scale = 0 THEN vd
              ELSE list_transform(vd, x -> x - {q} * scale / 127) END AS diff
  FROM s
)
SELECT vec_id,
       CAST(len(qv) AS INT) AS n_dims,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS sum_q,
       CAST(list_aggregate(list_transform(qv, x -> abs(x)), 'sum')
            AS BIGINT) AS q_l1,
       CAST(floor({MICRO} * scale) AS BIGINT) AS scale_micro,
       CAST(floor({MICRO} * list_inner_product(diff, diff)) AS BIGINT)
         AS err_micro
FROM d
"""
