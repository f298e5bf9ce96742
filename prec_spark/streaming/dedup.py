"""Exactly-once ingestion dedup: dropDuplicatesWithinWatermark.

Real event feeds are at-least-once: replays (producer retries, log
re-reads, checkpoint rewinds) deliver the same event twice.  The
batch engine dedups on read; the STREAMING ingest needs the dedup to
happen online with BOUNDED state — Spark's
``dropDuplicatesWithinWatermark`` keeps one state entry per key only
until the watermark passes the event's time + delay, which is the
whole point at cluster scale: state is (delay window x arrival rate),
not the full history.

There is no driver-gated query for this operator because the gate
tables are duplicate-free by construction — the evidence is the
stream test: a staged source where one file REPLAYS a slice of an
earlier file must come out row-identical to the clean input
(tests/test_stream_dedup.py), duplicates arriving within the delay.

Engine extension like streaming/joins.py (the reference is strictly
batch, SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .events import EVENTS_SCHEMA

DELAY = "45 days"  # covers the whole synthetic corpus: nothing evicted
                   # before its replay arrives, so the dedup is exact


def run_dedup_stream(
    spark: SparkSession, src_dir: str, name: str = "events_deduped"
) -> DataFrame:
    """Stream ``src_dir`` (staged parquet event files, possibly with
    replayed rows), dedup by event_id within the watermark, and return
    the deduped rows from the memory sink."""
    s = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        s.withWatermark("ts", DELAY)
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("dedup stream did not finish in 300s")
    finally:
        q.stop()
    return spark.table(name)
