"""At-least-once replay dedup (streaming/dedup.py): a staged source
where a later file replays earlier rows must stream out identical to
the clean input."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from prec_spark.session import load_table
from prec_spark.streaming.dedup import run_dedup_stream

from .conftest import SF_DIR


def _stage_with_replay(spark, tmp_path):
    """3 event-time-ordered files; batch1 REPLAYS the newest third of
    batch0 (producer retry), batch2 replays a slice of batch1."""
    ev = load_table(spark, SF_DIR, "events")
    t1, t2 = "2024-01-11", "2024-01-21"
    parts = [
        ev.filter(F.col("ts") < t1),
        ev.filter((F.col("ts") >= t1) & (F.col("ts") < t2)),
        ev.filter(F.col("ts") >= t2),
    ]
    replays = [
        None,
        parts[0].filter(F.col("ts") >= "2024-01-08"),
        parts[1].filter(F.col("ts") >= "2024-01-18"),
    ]
    src = str(tmp_path / "dedup_src")
    for i, (p, r) in enumerate(zip(parts, replays)):
        df = p if r is None else p.unionAll(r)
        df.coalesce(1).write.parquet(f"{src}/f{i}")
        (part,) = glob.glob(f"{src}/f{i}/part-*.parquet")
        shutil.move(part, f"{src}/batch{i}.parquet")
        shutil.rmtree(f"{src}/f{i}")
    return src, ev


COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_replayed_rows_deduped(spark, tmp_path):
    src, clean = _stage_with_replay(spark, tmp_path)
    out = run_dedup_stream(spark, src, name="ev_dedup_test")
    got = out.select(*COLS).collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)), "duplicates survived"
    want = {tuple(r) for r in clean.select(*COLS).collect()}
    assert {tuple(r) for r in got} == want and want
