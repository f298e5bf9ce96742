"""Streaming ingestion of events: watermarked tumbling-window rollup.

The reference is strictly batch (SURVEY.md §2.9); our engine adds the
Structured Streaming path a production transcript pipeline needs for
late-arriving events: file-source readStream -> event-time window +
watermark -> aggregation. The batch twin of the same plan is the
correctness oracle (stream/batch equivalence).

At scale the same query runs over a Kafka/Iceberg-CDC source with the
identical plan; only the source/sink change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _windowed(df: DataFrame) -> DataFrame:
    return (
        df.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def windowed_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _windowed(events)


def windowed_value_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated tumbling-day rollup: value is converted to integer
    CENTS per event before summing, so the aggregate is a commutative
    integer sum — order-free and hash-gateable cross-engine, where a
    double sum would depend on partition order.  (Spark F.round and
    DuckDB round both round half away from zero for this cast.)"""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("total_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value_cents",
        )
    )


def windowed_value_rollup_oracle_sql() -> str:
    """date_trunc('day') == the UTC-aligned 1-day tumbling window."""
    return """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM events
GROUP BY 1, 2
"""


def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, p50/p90/p99_cents) — EXACT discrete
    percentiles, hash-gateable because both engines spell the same
    selection rule: rank rows per type by (cents, event_id) and pick
    rank ((n-1)*q) div 100 + 1.  Interpolating percentile functions
    differ across engines (and floats don't hash); a pinned discrete
    rank does.

    Scale notes: one per-type Window sort — exact per-key percentiles
    fundamentally need a per-key ordering pass.  Event-type
    cardinality is tiny, so each group is one task's sort; for skewed
    giant keys switch to a two-pass range-partitioned quantile (or the
    approx sketch) — this operator is the exact-analytics tier."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wp = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )

    def pick(q: int):
        return F.max(
            F.when(
                F.col("rn") == F.expr(f"((n - 1) * {q}) div 100 + 1"),
                F.col("cents"),
            )
        ).alias(f"p{q}_cents")

    return r.groupBy("event_type").agg(
        F.max("n").alias("n_events"), pick(50), pick(90), pick(99)
    )


def events_percentiles_oracle_sql() -> str:
    def pick(q: int) -> str:
        return (
            f"MAX(CASE WHEN rn = ((n - 1) * {q}) // 100 + 1 "
            f"THEN cents END) AS p{q}_cents"
        )

    return f"""
WITH c AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
       {pick(50)}, {pick(90)}, {pick(99)}
FROM r GROUP BY event_type
"""


def run_windowed_counts_stream(
    spark: SparkSession, sf_dir: str, name: str = "events_windowed"
) -> DataFrame:
    """Run the streaming twin to completion (availableNow) and return
    the result from the in-memory sink."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    query = (
        _windowed(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return spark.table(name)
