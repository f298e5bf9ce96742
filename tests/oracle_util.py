"""Local replica of the driver's Spark-vs-DuckDB comparison."""

import math
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _release_storage(spark):
    """Drop per-query storage so 33 gate queries fit one 4 GiB session:
    clear catalog caches, then force a driver GC so the ContextCleaner
    releases now-unreferenced localCheckpoint / broadcast blocks (they
    are only cleaned after driver garbage collection)."""
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def compare(spark_df, oracle_sql: str, sf_dir: str):
    """Sorted-row comparison (column order normalized by name)."""
    cols = sorted(spark_df.columns)
    spark_rows = sorted(
        tuple(_norm(getattr(r, c)) for c in cols) for r in spark_df.collect()
    )
    _release_storage(spark_df.sparkSession)
    con = duck_con(sf_dir)
    res = con.execute(oracle_sql)
    duck_cols = [d[0] for d in res.description]
    assert sorted(duck_cols) == cols, f"columns differ: {sorted(duck_cols)} vs {cols}"
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(row[i]) for i in idx) for row in res.fetchall())
    assert len(spark_rows) == len(duck_rows), (
        f"row counts differ: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
    ]
    assert not mismatches, f"first mismatches: {mismatches[:3]}"
