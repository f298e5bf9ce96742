"""Watermarked stream-stream interval join: reply-latency pairs.

The one Structured Streaming surface the engine didn't cover yet:
joining a stream to ANOTHER stream (here the turn stream to itself)
under an event-time interval, the canonical "correlate two live
feeds" pattern (request/response, message/ack, turn/reply).  Spark
can only run it with BOTH sides watermarked and a time-range
predicate between their event-time columns — that pair is what lets
the engine EVICT join state, so memory stays bounded by (watermark
delay + interval) x arrival rate instead of growing with the stream.

Query: for every turn, find the next turn of the same conversation
(turn_idx + 1) arriving within +/- HORIZON_MIN minutes, and report
the reply latency in whole seconds.  The interval is symmetric
because transcript timestamps are NOT monotone within a conversation
(clock skew between agents — measured thousands of inversions in the
corpus), so a "reply" can carry an earlier timestamp than the turn it
answers.

Latency is an integer (epoch-second difference), so the result
value-hashes across engines; the DuckDB oracle is the identical
self-join.  The stream twin must equal the batch twin exactly: inner
stream-stream joins emit matches immediately (the watermark is used
for state eviction, not emission), and the staged-batch test keeps
the watermark delay comfortably above the cross-batch timestamp
inversions, so nothing is dropped.

No reference counterpart (PREC is strictly batch; SURVEY.md §2.9) —
engine extension like streaming/kg.py and streaming/sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..transcripts import transcripts_df, transcripts_oracle_sql

TRANSCRIPTS_SCHEMA = (
    "conv_id STRING, turn_idx INT, role STRING, text STRING, "
    # staged parquet carries NTZ micros; the stream schema reads them
    # as TIMESTAMP (UTC session) because watermarks reject NTZ —
    # same trick as streaming/kg.py:41
    "tool STRING, ts TIMESTAMP"
)
HORIZON_MIN = 15
WATERMARK = "2 hours"


def _reply_pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Interval self-join core, shared verbatim by the batch and
    stream twins (same-plan equivalence, the repo's streaming
    contract)."""
    bb = b.select(
        F.col("conv_id").alias("b_conv"),
        F.col("turn_idx").alias("b_idx"),
        F.col("role").alias("reply_role"),
        F.col("ts").alias("b_ts"),
    )
    cond = (
        (F.col("conv_id") == F.col("b_conv"))
        & (F.col("b_idx") == F.col("turn_idx") + 1)
        & (F.col("b_ts") >= F.col("ts") - F.expr(f"INTERVAL {HORIZON_MIN} MINUTES"))
        & (F.col("b_ts") <= F.col("ts") + F.expr(f"INTERVAL {HORIZON_MIN} MINUTES"))
    )
    return (
        a.select("conv_id", "turn_idx", "role", "ts")
        .join(bb, cond)
        .select(
            "conv_id",
            "turn_idx",
            "role",
            "reply_role",
            # repo ts idiom: == DuckDB epoch_us(ts)//1000000 (UTC tz)
            (
                F.col("b_ts").cast("timestamp").cast("long")
                - F.col("ts").cast("timestamp").cast("long")
            ).alias("latency_s"),
        )
    )


def reply_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin (the driver-gated query)."""
    from ..cached import cached_transcripts

    turns = cached_transcripts(spark, sf_dir)
    return _reply_pairs(turns, turns)


def reply_latency_oracle_sql(horizon_min: int = HORIZON_MIN) -> str:
    return f"""
WITH t AS ({transcripts_oracle_sql()})
SELECT t1.conv_id, t1.turn_idx, t1.role, t2.role AS reply_role,
       epoch_us(t2.ts) // 1000000 - epoch_us(t1.ts) // 1000000
         AS latency_s
FROM t t1
JOIN t t2
  ON t2.conv_id = t1.conv_id AND t2.turn_idx = t1.turn_idx + 1
 AND t2.ts >= t1.ts - INTERVAL {horizon_min} MINUTE
 AND t2.ts <= t1.ts + INTERVAL {horizon_min} MINUTE
"""


def reply_latency_stream(
    spark: SparkSession, src_dir: str, name: str = "reply_latency_stream"
) -> DataFrame:
    """Stream twin: two file-source streams over the same staged turn
    files, both watermarked, joined under the interval predicate, run
    to completion (availableNow) into a memory sink."""

    def turn_stream() -> DataFrame:
        return (
            spark.readStream.schema(TRANSCRIPTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)  # one staged file per batch
            .parquet(src_dir)
        )

    a = turn_stream().withWatermark("ts", WATERMARK)
    b = turn_stream().withWatermark("ts", WATERMARK)
    q = (
        _reply_pairs(a, b)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("reply_latency stream did not finish in 300s")
    finally:
        q.stop()
    return spark.table(name)
