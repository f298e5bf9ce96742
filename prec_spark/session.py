"""SparkSession helpers tuned for the KG-construction pipeline.

Defaults target correctness tests on local[*]; at cluster scale the same
builder is used by spark-submit with its own --conf overrides.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "prec-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    * AQE on (runtime coalesce + skew-join splitting — our transcript
      tables have hot conversations, see FIXTURES.md §1).
    * Arrow on (all Python interchange is Arrow-batched; no per-row
      Python anywhere in the pipeline).
    * shuffle partitions default to 2x cores locally; on a real cluster
      the submitter sets this to ~2-3x total executor cores.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cpus) if master.startswith("local") else 256

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    driver_mem = (extra_conf or {}).get(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    )
    small_heap = driver_mem.lower().rstrip("gb").isdigit() and int(
        driver_mem.lower().rstrip("gb")
    ) <= 4
    if master.startswith("local") and small_heap:
        # single-JVM mode shares one small heap between driver and all
        # executor threads; the default (up to 32 MiB) task page size
        # makes concurrent broadcast/sort stages allocate G1-humongous
        # regions that livelock GC on a <=4 GiB heap (GCLocker retry
        # storms). 1 MiB pages remove that failure mode; bigger heaps
        # keep Spark's adaptive default (large pages sort faster).
        builder = builder.config("spark.buffer.pageSize", "1m")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver-generated parquet tables."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
