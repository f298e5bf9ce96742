"""Custom stateful streaming operator: user sessionization.

`applyInPandasWithState` over the events stream: groups events by
user_id, maintains per-user session state (session = events separated
by < GAP), emits closed sessions. This is the "custom stateful
operator" pattern the reference has no counterpart for (SURVEY.md
§2.9) — the state handling is Arrow-batched, never per-row Python
driver-side.

The batch twin (`sessionize_batch`) computes identical sessions with a
window/lag gap analysis — used as the equivalence oracle in tests.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

from .events import EVENTS_SCHEMA

GAP_MINUTES = 60

SESSION_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events INT"
)
STATE_SCHEMA = "start LONG, last LONG, n INT"


def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch (window + lag + running sum)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > GAP_MINUTES * 60), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("int").alias("n_events"),
    ).drop("session_id")


def sessionize_oracle_sql() -> str:
    """The identical gap analysis in SQL.  The gap is computed on
    WHOLE epoch seconds (``epoch_us // 1_000_000``) because Spark's
    timestamp->long cast truncates to seconds — mirroring the batch
    plan exactly, fractional-second differences and all."""
    gap = GAP_MINUTES * 60
    return f"""
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR epoch_us(ts) // 1000000
                 - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
                 > {gap}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
         ) AS session_id
  FROM m
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS INT) AS n_events
FROM s GROUP BY user_id, session_id
"""


def _sessionize_group(key, pdfs, state: GroupState):
    """applyInPandasWithState update function (Arrow-batched)."""
    (user_id,) = key
    events = pd.concat(list(pdfs))
    ts = sorted(events["ts"].tolist())

    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0

    out_rows = []
    gap = dt.timedelta(minutes=GAP_MINUTES)
    for t in ts:
        t_epoch = t
        if start is None:
            start, last, n = t_epoch, t_epoch, 1
        elif (t_epoch - last) > gap:
            out_rows.append((user_id, start, last, n))
            start, last, n = t_epoch, t_epoch, 1
        else:
            last, n = t_epoch, n + 1
    if start is not None:
        # flush the open session too (availableNow bounded input: the
        # final batch closes remaining state)
        out_rows.append((user_id, start, last, n))
        state.remove()
    yield pd.DataFrame(
        out_rows, columns=["user_id", "session_start", "session_end", "n_events"]
    )


def sessionize_stream(
    spark: SparkSession, sf_dir: str, name: str = "event_sessions"
) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    sessions = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start TIMESTAMP, last TIMESTAMP, n INT",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)
