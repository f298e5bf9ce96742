"""Temporal joins Spark lacks as built-ins: AS-OF and interval RANGE.

Both are first-class operators in time-series engines; Spark has no
native form, so each is re-expressed as a composition with the right
distributed shape:

* **As-of join** ("latest reference row at-or-before each probe row,
  per key"): the naive formulation is a per-probe subquery (quadratic)
  or an inequality join (a BroadcastNestedLoopJoin / cross-product at
  scale). The distributed shape used here is UNION-TAG + CARRY-FORWARD:
  tag references 0 and probes 1, union them, and run ONE window per key
  ordered by (ts, tag) taking last(ref_ts, ignorenulls) — a single
  sort-shuffle on the key, linear in rows, no row explosion. Ordering
  refs before probes at equal ts gives at-or-before (>=) semantics.
  The oracle is DuckDB's NATIVE ASOF JOIN — an independent
  implementation of the operator, not a mirror of this plan.

* **Range join** (event within [start, end] interval, per key): joined
  on the equi-key with the interval predicate as a post-join filter, so
  Catalyst plans a hash/sort-merge join on the key — never a nested-
  loop over the cross product. Intervals per key are bounded (sessions
  of one user), which is what makes the filter-after-equi-join shape
  the right one at 100 TB; for unkeyed interval joins the standard
  trick is bucketing time into overlap-aligned grid cells first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .session import load_table
from .streaming.sessions import sessionize_batch, sessionize_oracle_sql

PROBE_TYPE = "purchase"
REF_TYPE = "signup"


def asof_join(
    probes: DataFrame, refs: DataFrame, key: str, ts: str, ref_cols: list[str]
) -> DataFrame:
    """Generic as-of join: for every probe row, the reference row with
    the greatest ``ts`` <= the probe's, sharing ``key``. Returns the
    probe columns plus ``ref_cols`` (null when no reference precedes).
    One shuffle+sort on ``key``; no inequality join anywhere."""
    r = refs.select(
        key,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_ref_{c}") for c in ref_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c)
          for c in probes.columns if c not in (key,)],
    )
    p = probes.select(
        key,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(refs.schema[c].dataType).alias(f"_ref_{c}")
          for c in ref_cols],
        *[c for c in probes.columns if c not in (key,)],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(p).select(
        "*",
        *[F.last(f"_ref_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
          for c in ref_cols],
    )
    return carried.filter(F.col("_tag") == 1).select(
        key,
        *[c for c in probes.columns if c not in (key,)],
        *[F.col(f"_asof_{c}").alias(f"ref_{c}") for c in ref_cols],
    )


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the same user's latest at-or-before
    signup: (event_id, user_id, ts, ref_ts, gap_s). gap_s is whole
    seconds (epoch truncation, the repo's cross-engine ts convention);
    purchases before any signup keep null ref columns."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == PROBE_TYPE).select(
        "user_id", "ts", "event_id"
    )
    refs = ev.filter(F.col("event_type") == REF_TYPE).select("user_id", "ts")
    out = asof_join(probes, refs, key="user_id", ts="ts", ref_cols=["ts"])
    # NTZ cannot cast straight to long; the ltz hop's offset cancels in
    # the difference (same convention as streaming/sessions.py)
    e = F.col("ts").cast("timestamp").cast("long")
    r = F.col("ref_ts").cast("timestamp").cast("long")
    return out.select(
        "event_id", "user_id", "ts", "ref_ts", (e - r).alias("gap_s")
    )


def events_asof_join_oracle_sql() -> str:
    """DuckDB's native ASOF JOIN — an independent operator
    implementation, not a replay of the Spark plan."""
    return f"""
    SELECT e.event_id, e.user_id, e.ts, r.ts AS ref_ts,
           epoch_us(e.ts) // 1000000 - epoch_us(r.ts) // 1000000 AS gap_s
    FROM (SELECT * FROM events WHERE event_type = '{PROBE_TYPE}') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = '{REF_TYPE}') r
      ON e.user_id = r.user_id AND e.ts >= r.ts
    """


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event tagged with its gap-session interval: equi-join on
    user_id, interval containment as the residual predicate. Totality
    (row count == events count) is part of the gate: sessions were
    derived from these events, so every event must land in exactly one
    interval."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    sess = sessionize_batch(spark, sf_dir)
    joined = ev.join(sess, "user_id").filter(
        (F.col("ts") >= F.col("session_start"))
        & (F.col("ts") <= F.col("session_end"))
    )
    return joined.select(
        "event_id", "user_id", "session_start", "session_end",
        F.col("n_events").alias("session_size"),
    )


def events_range_join_oracle_sql() -> str:
    return f"""
    WITH s AS ({sessionize_oracle_sql()})
    SELECT e.event_id, e.user_id, s.session_start, s.session_end,
           s.n_events AS session_size
    FROM events e JOIN s ON e.user_id = s.user_id
      AND e.ts BETWEEN s.session_start AND s.session_end
    """
