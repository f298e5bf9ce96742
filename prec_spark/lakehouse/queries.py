"""Driver-gated queries exercising the IceLite lakehouse end-to-end.

The staged table is derived from the deterministic transcripts input
(one build per process + testdata generation, like the Bolt dump
staging in entry_queries.py):

  v1  CREATE  partitioned by role
  v2  APPEND  the even turns   (exactly the role='user' rows)
  v3  APPEND  the odd turns    (exactly the role='assistant' rows)
  v4  OVERWRITE the role='user' partition with revised text
      (" [v2]" suffix) and a NEW column rev=2 (schema evolution)

``lakehouse_scan`` reads the current snapshot through manifest
planning with a timestamp predicate; ``lakehouse_time_travel`` reads
snapshots 1..3 (append/append/overwrite) and aggregates each. Both
have exact DuckDB oracles over the raw transcripts derivation — the
table format must neither lose, duplicate, nor stale any row for the
hashes to match.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cached import cached_transcripts
from ..transcripts import transcripts_oracle_sql
from .table import IceLiteTable
from .zorder import zorder_key, zorder_key_sql

_TABLES: dict[str, str] = {}

_CUTOFF = datetime.datetime(1995, 6, 1)
_FINAL_VERSION = 4  # create + append + append + overwrite


def _table_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the staged IceLite table for this testdata dir."""
    cached = _TABLES.get(sf_dir)
    if cached is not None:
        return cached
    src = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(src)
        key = f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = sf_dir
    root = os.path.join(
        tempfile.gettempdir(),
        "prec_spark_lakehouse_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    hint = os.path.join(root, "metadata", "version-hint.text")
    try:
        with open(hint) as fh:
            if int(fh.read().strip()) >= _FINAL_VERSION:
                _TABLES[sf_dir] = root
                return root
    except (OSError, ValueError):
        pass
    import shutil

    shutil.rmtree(root, ignore_errors=True)

    t = cached_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    tbl = IceLiteTable.create(spark, root, t.schema, partition_by=("role",))
    tbl.append(t.filter(F.col("turn_idx") % 2 == 0))
    tbl.append(t.filter(F.col("turn_idx") % 2 == 1))
    tbl.overwrite_partitions(
        t.filter(F.col("role") == "user")
        .withColumn("text", F.concat(F.col("text"), F.lit(" [v2]")))
        .withColumn("rev", F.lit(2).cast("int"))
    )
    _TABLES[sf_dir] = root
    return root


_MERGE_TABLES: dict[str, str] = {}


def _merge_table_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) a table that has been through a copy-on-write MERGE:

      v1 CREATE partitioned by role
      v2 APPEND all turns
      v3 MERGE keyed on (conv_id, turn_idx):
         - UPDATE every turn with turn_idx % 7 == 0 (text gets
           ' [merged]' appended),
         - INSERT one synthetic 'system' turn (turn_idx=999) per
           conversation.
    """
    cached = _MERGE_TABLES.get(sf_dir)
    if cached is not None:
        return cached
    src = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(src)
        key = f"merge|{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = "merge|" + sf_dir
    root = os.path.join(
        tempfile.gettempdir(),
        "prec_spark_lakemerge_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    hint = os.path.join(root, "metadata", "version-hint.text")
    try:
        with open(hint) as fh:
            if int(fh.read().strip()) >= 3:
                _MERGE_TABLES[sf_dir] = root
                return root
    except (OSError, ValueError):
        pass
    import shutil

    shutil.rmtree(root, ignore_errors=True)

    t = cached_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    tbl = IceLiteTable.create(spark, root, t.schema, partition_by=("role",))
    tbl.append(t)
    updates = (
        t.filter(F.col("turn_idx") % 7 == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit(" [merged]")))
    )
    inserts = t.select("conv_id").distinct().select(
        "conv_id",
        F.lit(999).cast("int").alias("turn_idx"),
        F.lit("system").alias("role"),
        F.lit("merge-insert").alias("text"),
        F.lit("merged").alias("tool"),
        F.lit("2000-01-01 00:00:00").cast(t.schema["ts"].dataType).alias("ts"),
    )
    tbl.merge(updates.unionByName(inserts), on=("conv_id", "turn_idx"))
    _MERGE_TABLES[sf_dir] = root
    return root


def lakehouse_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full post-MERGE table state: updates applied, inserts present,
    untouched rows byte-identical — any lost/duplicated/stale row (or a
    rewrite of a file that should not have been touched) breaks the hash."""
    tbl = IceLiteTable(spark, _merge_table_root(spark, sf_dir))
    return tbl.read()


def lakehouse_merge_oracle_sql() -> str:
    return f"""
    WITH t AS ({transcripts_oracle_sql()})
    SELECT conv_id, turn_idx, role,
           CASE WHEN turn_idx % 7 = 0 THEN text || ' [merged]' ELSE text END AS text,
           tool, ts
    FROM t
    UNION ALL
    SELECT DISTINCT conv_id, CAST(999 AS INTEGER) AS turn_idx,
           'system' AS role, 'merge-insert' AS text, 'merged' AS tool,
           TIMESTAMP '2000-01-01 00:00:00' AS ts
    FROM t
    """


_ZORDER_TABLES: dict[str, str] = {}

#: z-key layout dims: 10 bits each of user_id and cents-mod-1024.
_Z_BITS = 10


def _zorder_table_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) an UNPARTITIONED events-derived table, then z-order
    rewrite it on (user_id, cents % 1024) into 8 files."""
    cached = _ZORDER_TABLES.get(sf_dir)
    if cached is not None:
        return cached
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        key = f"zorder|{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = "zorder|" + sf_dir
    root = os.path.join(
        tempfile.gettempdir(),
        "prec_spark_lakezorder_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    hint = os.path.join(root, "metadata", "version-hint.text")
    try:
        with open(hint) as fh:
            if int(fh.read().strip()) >= 3:  # create + append + rewrite
                _ZORDER_TABLES[sf_dir] = root
                return root
    except (OSError, ValueError):
        pass
    import shutil

    shutil.rmtree(root, ignore_errors=True)

    ev = (
        spark.read.parquet(src)
        .select(
            "event_id",
            F.col("user_id").cast("long").alias("user_id"),
            (F.round(F.col("value") * 100, 0).cast("long") % 1024).alias("cents_lo"),
        )
    )
    tbl = IceLiteTable.create(spark, root, ev.schema)
    tbl.append(ev)
    tbl.rewrite_clustered(zorder_key(["user_id", "cents_lo"], _Z_BITS), 8)
    _ZORDER_TABLES[sf_dir] = root
    return root


def lakehouse_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back the z-order-rewritten table with the Morton key: gates
    both the rewrite (no row lost/duplicated) and the bit-interleave
    arithmetic (exact integer twin in DuckDB)."""
    tbl = IceLiteTable(spark, _zorder_table_root(spark, sf_dir))
    return tbl.read().withColumn(
        "zkey", zorder_key(["user_id", "cents_lo"], _Z_BITS)
    )


def lakehouse_zorder_oracle_sql() -> str:
    zexpr = zorder_key_sql(["user_id", "cents_lo"], _Z_BITS)
    return f"""
    WITH base AS (
      SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
             CAST(round(value * 100) AS BIGINT) % 1024 AS cents_lo
      FROM events
    )
    SELECT event_id, user_id, cents_lo,
           CAST({zexpr} AS BIGINT) AS zkey
    FROM base
    """


def lakehouse_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-snapshot scan with manifest predicate planning.

    ``rev`` is null-backfilled for pre-evolution files (proven by the
    unit tests); the gate output coalesces it to 0 because the driver's
    row-sort comparator cannot order mixed None/int tuples.
    """
    tbl = IceLiteTable(spark, _table_root(spark, sf_dir))
    df = tbl.scan(predicates=(("ts", ">=", _CUTOFF),))
    return df.withColumn("rev", F.coalesce(F.col("rev"), F.lit(0)).cast("int"))


def lakehouse_scan_oracle_sql() -> str:
    return f"""
    WITH t AS ({transcripts_oracle_sql()})
    SELECT conv_id, turn_idx, role,
           CASE WHEN role = 'user' THEN text || ' [v2]' ELSE text END AS text,
           tool, ts,
           CAST(CASE WHEN role = 'user' THEN 2 ELSE 0 END AS INTEGER) AS rev
    FROM t
    WHERE ts >= TIMESTAMP '1995-06-01 00:00:00'
    """


def lakehouse_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan of snapshot 1 -> 2 on the staged table:
    exactly the second append (the odd turns), never the whole table —
    the delta a daily training-data refresh consumes."""
    tbl = IceLiteTable(spark, _table_root(spark, sf_dir))
    return tbl.read_incremental(1, 2)


def lakehouse_incremental_oracle_sql() -> str:
    return f"""
    WITH t AS ({transcripts_oracle_sql()})
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM t WHERE turn_idx % 2 = 1
    """


def lakehouse_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-snapshot aggregates: snapshot isolation as a value gate."""
    tbl = IceLiteTable(spark, _table_root(spark, sf_dir))
    out = None
    for sid in (1, 2, 3):
        df = tbl.read(snapshot_id=sid).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.sum("turn_idx").cast("long").alias("sum_turn"),
            F.sum(F.col("text").endswith(" [v2]").cast("long")).alias("n_edited"),
        ).select(F.lit(sid).cast("int").alias("snapshot_id"), "*")
        out = df if out is None else out.unionByName(df)
    return out


def lakehouse_time_travel_oracle_sql() -> str:
    base = (
        "SELECT {sid} AS snapshot_id,"
        " CAST(COUNT(*) AS BIGINT) AS n_rows,"
        " CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,"
        " CAST(SUM(turn_idx) AS BIGINT) AS sum_turn,"
        " CAST({edited} AS BIGINT) AS n_edited"
        " FROM t{where}"
    )
    return (
        f"WITH t AS ({transcripts_oracle_sql()}) "
        + base.format(sid="CAST(1 AS INTEGER)", edited="0",
                      where=" WHERE turn_idx % 2 = 0")
        + " UNION ALL "
        + base.format(sid="CAST(2 AS INTEGER)", edited="0", where="")
        + " UNION ALL "
        + base.format(
            sid="CAST(3 AS INTEGER)",
            edited="SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END)",
            where="",
        )
    )


_DELETE_TABLES: dict[str, str] = {}


def _delete_table_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) a table that has been through two MERGE-ON-READ
    position deletes (no data file rewritten):

      v1 CREATE unpartitioned
      v2 APPEND all turns
      v3 DELETE WHERE role = 'assistant' AND turn_idx % 3 = 0
      v4 DELETE WHERE tool IS NOT NULL AND turn_idx % 4 = 1
         (accumulating a second delete file on the same data files)
    """
    cached = _DELETE_TABLES.get(sf_dir)
    if cached is not None:
        return cached
    src = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(src)
        key = f"del|{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = "del|" + sf_dir
    root = os.path.join(
        tempfile.gettempdir(),
        "prec_spark_lakedel_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    hint = os.path.join(root, "metadata", "version-hint.text")
    try:
        with open(hint) as fh:
            if int(fh.read().strip()) >= 4:
                _DELETE_TABLES[sf_dir] = root
                return root
    except (OSError, ValueError):
        pass
    import shutil

    shutil.rmtree(root, ignore_errors=True)

    t = cached_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    tbl = IceLiteTable.create(spark, root, t.schema)
    tbl.append(t)
    tbl.delete_where(
        (F.col("role") == "assistant") & (F.col("turn_idx") % 3 == 0)
    )
    tbl.delete_where(F.col("tool").isNotNull() & (F.col("turn_idx") % 4 == 1))
    _DELETE_TABLES[sf_dir] = root
    return root


def lakehouse_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state after two accumulated merge-on-read position
    deletes: the gate fails if a deleted row survives, a kept row is
    dropped, or either delete rewrote data it should not have."""
    tbl = IceLiteTable(spark, _delete_table_root(spark, sf_dir))
    return tbl.read()


def lakehouse_delete_oracle_sql() -> str:
    return f"""
    WITH t AS ({transcripts_oracle_sql()})
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM t
    WHERE NOT (role = 'assistant' AND turn_idx % 3 = 0)
      AND NOT (tool IS NOT NULL AND turn_idx % 4 = 1)
    """


_HIDDEN_TABLES: dict[str, str] = {}

_HIDDEN_CUTOFF = datetime.datetime(2024, 1, 25)


def _hidden_table_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) an events table with HIDDEN partitioning —
    day(ts) x bucket(4, user_id) — no materialized partition columns."""
    cached = _HIDDEN_TABLES.get(sf_dir)
    if cached is not None:
        return cached
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        key = f"hidden|{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = "hidden|" + sf_dir
    root = os.path.join(
        tempfile.gettempdir(),
        "prec_spark_lakehidden_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    hint = os.path.join(root, "metadata", "version-hint.text")
    try:
        with open(hint) as fh:
            if int(fh.read().strip()) >= 2:  # create + append
                _HIDDEN_TABLES[sf_dir] = root
                return root
    except (OSError, ValueError):
        pass
    import shutil

    shutil.rmtree(root, ignore_errors=True)

    ev = spark.read.parquet(src).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    tbl = IceLiteTable.create(
        spark, root, ev.schema, partition_by=("day(ts)", "bucket(4,user_id)")
    )
    tbl.append(ev)
    _HIDDEN_TABLES[sf_dir] = root
    return root


def lakehouse_hidden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed scan of the hidden-partitioned table: planning
    prunes whole day directories by mapping ``ts >= cutoff`` into the
    day() transform domain (the unit tests pin the file counts); the
    value gate proves pruning never costs a row."""
    tbl = IceLiteTable(spark, _hidden_table_root(spark, sf_dir))
    return tbl.scan(predicates=(("ts", ">=", _HIDDEN_CUTOFF),))


def lakehouse_hidden_oracle_sql() -> str:
    return f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '{_HIDDEN_CUTOFF:%Y-%m-%d %H:%M:%S}'
    """


_EVO_TABLES: dict[str, str] = {}


def _evo_table_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) a table that has been through full schema
    evolution — the field-id resolution paths a long-lived production
    table accumulates:

      v1 CREATE  (conv_id, turn_idx, role, text, tool)
      v2 APPEND  the even turns          (written under ORIGINAL names)
      v3 RENAME  text -> content         (metadata-only)
      v4 DROP    tool                    (metadata-only)
      v5 APPEND  the odd turns as (.., content, sentiment)
                                         (written under NEW names)
    """
    cached = _EVO_TABLES.get(sf_dir)
    if cached is not None:
        return cached
    src = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(src)
        key = f"evo|{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        key = "evo|" + sf_dir
    root = os.path.join(
        tempfile.gettempdir(),
        "prec_spark_lakeevo_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    hint = os.path.join(root, "metadata", "version-hint.text")
    try:
        with open(hint) as fh:
            if int(fh.read().strip()) >= 5:
                _EVO_TABLES[sf_dir] = root
                return root
    except (OSError, ValueError):
        pass
    import shutil

    shutil.rmtree(root, ignore_errors=True)

    t = cached_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )
    tbl = IceLiteTable.create(spark, root, t.schema)
    tbl.append(t.filter(F.col("turn_idx") % 2 == 0))
    tbl.rename_column("text", "content")
    tbl.drop_column("tool")
    tbl.append(
        t.filter(F.col("turn_idx") % 2 == 1)
        .select(
            "conv_id", "turn_idx", "role",
            F.col("text").alias("content"),
            (F.length("text") % 5).cast("int").alias("sentiment"),
        )
    )
    _EVO_TABLES[sf_dir] = root
    return root


def lakehouse_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read across a rename + drop + add history: pre-rename files
    must surface their ``text`` bytes under ``content`` (field-id
    resolution), the dropped ``tool`` column must be gone, and
    ``sentiment`` is null-backfilled for the old files (coalesced to
    -1 — the driver's row-sort comparator cannot order mixed None/int
    tuples)."""
    tbl = IceLiteTable(spark, _evo_table_root(spark, sf_dir))
    df = tbl.read()
    return df.withColumn(
        "sentiment", F.coalesce(F.col("sentiment"), F.lit(-1)).cast("int")
    )


def lakehouse_evolution_oracle_sql() -> str:
    return f"""
    WITH t AS ({transcripts_oracle_sql()})
    SELECT conv_id, turn_idx, role, text AS content,
           CAST(-1 AS INTEGER) AS sentiment
    FROM t WHERE turn_idx % 2 = 0
    UNION ALL
    SELECT conv_id, turn_idx, role, text AS content,
           CAST(length(text) % 5 AS INTEGER) AS sentiment
    FROM t WHERE turn_idx % 2 = 1
    """
