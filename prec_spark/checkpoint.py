"""Checkpoint-resumable stage execution with per-partition lineage.

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics". Each stage writes its output as parquet under the
pipeline workdir; a stage whose output already exists (Spark's own
_SUCCESS marker) is NOT recomputed on resume — the parquet is read
back and downstream lineage continues from it. Per-partition row
counts (spark_partition_id groupBy) and wall time are appended to
``metrics.jsonl``.

The reference has no counterpart (strictly in-memory batch,
SURVEY.md §2.9); this is pure scale infrastructure.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageMetrics:
    stage: str
    rows: int
    partitions: int
    wall_ms: int
    resumed: bool
    per_partition: list[dict] = field(default_factory=list)


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, workdir: str, collect_lineage: bool = True):
        self.spark = spark
        self.workdir = workdir
        self.collect_lineage = collect_lineage
        self.metrics: list[StageMetrics] = []
        os.makedirs(workdir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def stage(self, name: str, build, partition_by: str | None = None) -> DataFrame:
        """Run (or resume) one stage. `build` is a thunk returning the
        stage's DataFrame; its output is persisted as parquet."""
        t0 = time.time()
        path = self._path(name)
        resumed = self._done(name)
        if not resumed:
            df = build()
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(partition_by)
            writer.parquet(path)
        out = self.spark.read.parquet(path)

        per_partition: list[dict] = []
        rows = -1
        n_parts = out.rdd.getNumPartitions()
        if self.collect_lineage:
            pp = (
                out.groupBy(F.spark_partition_id().alias("partition_id"))
                .count()
                .collect()
            )
            per_partition = [
                {"partition_id": r.partition_id, "rows": r["count"]} for r in pp
            ]
            rows = sum(p["rows"] for p in per_partition)

        m = StageMetrics(
            stage=name,
            rows=rows,
            partitions=n_parts,
            wall_ms=int((time.time() - t0) * 1000),
            resumed=resumed,
            per_partition=per_partition,
        )
        self.metrics.append(m)
        with open(os.path.join(self.workdir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(m.__dict__) + "\n")
        return out
