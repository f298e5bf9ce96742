"""ANALYZE-style table profiling — the data-quality report a pipeline
runs before trusting a new drop of upstream data.

One aggregate pass per table computes per-column counts, null counts,
exact distinct counts, min/max (integers; timestamps as epoch seconds via the repo's
portable UTC cast idiom), and string length
min/max/sum; the wide aggregate row is then unpivoted to the long
``(tbl, metric, value)`` shape a monitoring system ingests. Everything
is integer-exact, so the whole report hash-gates against DuckDB.

Scale note: the distinct counts here are EXACT (one expand per
distinct column in the single aggregate) because the gate needs exact
values; at 10^12 rows you swap them for the HLL sketch this repo also
ships (sketches/hll.py) and keep the rest of the report unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import load_table


def _profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    agg = d.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("doc_id").isNull().cast("long")).alias("id_nulls"),
        F.count_distinct(F.col("doc_id")).alias("id_ndv"),
        F.min("doc_id").cast("long").alias("id_min"),
        F.max("doc_id").cast("long").alias("id_max"),
        F.sum(F.col("text").isNull().cast("long")).alias("t_nulls"),
        F.count_distinct(F.col("text")).alias("t_ndv"),
        F.min(F.length("text")).cast("long").alias("t_lmin"),
        F.max(F.length("text")).cast("long").alias("t_lmax"),
        F.sum(F.length("text")).cast("long").alias("t_lsum"),
    )
    pairs = [
        ("rows", "rows"), ("doc_id.nulls", "id_nulls"),
        ("doc_id.n_distinct", "id_ndv"), ("doc_id.min", "id_min"),
        ("doc_id.max", "id_max"), ("text.nulls", "t_nulls"),
        ("text.n_distinct", "t_ndv"), ("text.len_min", "t_lmin"),
        ("text.len_max", "t_lmax"), ("text.len_sum", "t_lsum"),
    ]
    stack = ", ".join(f"'{m}', CAST({c} AS BIGINT)" for m, c in pairs)
    return agg.selectExpr(
        "'documents' AS tbl",
        f"stack({len(pairs)}, {stack}) AS (metric, value)",
    )


def _profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    agg = e.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct(F.col("event_id")).alias("id_ndv"),
        F.min("event_id").cast("long").alias("id_min"),
        F.max("event_id").cast("long").alias("id_max"),
        F.count_distinct(F.col("user_id")).alias("u_ndv"),
        F.min("user_id").cast("long").alias("u_min"),
        F.max("user_id").cast("long").alias("u_max"),
        F.count_distinct(F.col("event_type")).alias("ty_ndv"),
        F.sum(F.col("event_type").isNull().cast("long")).alias("ty_nulls"),
        F.min("ts").cast("timestamp").cast("long").alias("ts_min"),
        F.max("ts").cast("timestamp").cast("long").alias("ts_max"),
    )
    pairs = [
        ("rows", "rows"), ("event_id.n_distinct", "id_ndv"),
        ("event_id.min", "id_min"), ("event_id.max", "id_max"),
        ("user_id.n_distinct", "u_ndv"), ("user_id.min", "u_min"),
        ("user_id.max", "u_max"), ("event_type.n_distinct", "ty_ndv"),
        ("event_type.nulls", "ty_nulls"), ("ts.min_s", "ts_min"),
        ("ts.max_s", "ts_max"),
    ]
    stack = ", ".join(f"'{m}', CAST({c} AS BIGINT)" for m, c in pairs)
    return agg.selectExpr(
        "'events' AS tbl",
        f"stack({len(pairs)}, {stack}) AS (metric, value)",
    )


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tbl, metric, value): the long-format profile of documents +
    events, one aggregate pass per table."""
    return _profile_documents(spark, sf_dir).unionAll(
        _profile_events(spark, sf_dir)
    )


def table_profile_oracle_sql() -> str:
    doc = """
    SELECT 'documents' AS tbl, m.metric, m.value FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows,
             CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS id_nulls,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS id_ndv,
             CAST(MIN(doc_id) AS BIGINT) AS id_min,
             CAST(MAX(doc_id) AS BIGINT) AS id_max,
             CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_nulls,
             CAST(COUNT(DISTINCT text) AS BIGINT) AS t_ndv,
             CAST(MIN(length(text)) AS BIGINT) AS t_lmin,
             CAST(MAX(length(text)) AS BIGINT) AS t_lmax,
             CAST(SUM(length(text)) AS BIGINT) AS t_lsum
      FROM documents
    ) a, LATERAL (VALUES
      ('rows', a.rows), ('doc_id.nulls', a.id_nulls),
      ('doc_id.n_distinct', a.id_ndv), ('doc_id.min', a.id_min),
      ('doc_id.max', a.id_max), ('text.nulls', a.t_nulls),
      ('text.n_distinct', a.t_ndv), ('text.len_min', a.t_lmin),
      ('text.len_max', a.t_lmax), ('text.len_sum', a.t_lsum)
    ) m(metric, value)
    """
    ev = """
    SELECT 'events' AS tbl, m.metric, m.value FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows,
             CAST(COUNT(DISTINCT event_id) AS BIGINT) AS id_ndv,
             CAST(MIN(event_id) AS BIGINT) AS id_min,
             CAST(MAX(event_id) AS BIGINT) AS id_max,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u_ndv,
             CAST(MIN(user_id) AS BIGINT) AS u_min,
             CAST(MAX(user_id) AS BIGINT) AS u_max,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ty_ndv,
             CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ty_nulls,
             CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS ts_min,
             CAST(epoch_us(MAX(ts)) // 1000000 AS BIGINT) AS ts_max
      FROM events
    ) a, LATERAL (VALUES
      ('rows', a.rows), ('event_id.n_distinct', a.id_ndv),
      ('event_id.min', a.id_min), ('event_id.max', a.id_max),
      ('user_id.n_distinct', a.u_ndv), ('user_id.min', a.u_min),
      ('user_id.max', a.u_max), ('event_type.n_distinct', a.ty_ndv),
      ('event_type.nulls', a.ty_nulls), ('ts.min_s', a.ts_min),
      ('ts.max_s', a.ts_max)
    ) m(metric, value)
    """
    return f"{doc}\nUNION ALL\n{ev}"
