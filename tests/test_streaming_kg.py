"""Streaming KG construction: stream/batch equivalence.

Transcripts are split into two parquet files such that conversations
SPAN the file boundary (maxFilesPerTrigger=1 makes each file its own
micro-batch), so cross-batch NEXT edges exercise the stateful
operator's exactly-once pair emission. The distinct streamed triple
set must equal the batch flagship ∪ entity triples on the same rows.
"""

import pytest
from pyspark.sql import functions as F

from prec_spark.flagship import flagship_triples
from prec_spark.streaming.kg import kg_stream, stateless_triples
from prec_spark.text.mentions import entity_triples
from prec_spark.transcripts import transcripts_df


@pytest.fixture(scope="module")
def small_t(spark, sf_dir):
    # a deterministic 30-conversation slice keeps the streaming test fast
    t = transcripts_df(spark, sf_dir)
    convs = [r.conv_id for r in t.select("conv_id").distinct().orderBy("conv_id").limit(30).collect()]
    return t.filter(F.col("conv_id").isin(convs)).cache()


def test_stream_matches_batch(spark, small_t, tmp_path):
    src = str(tmp_path / "stream_src")
    # split so every conversation's turns straddle the two files
    small_t.filter(F.col("turn_idx") < 2).coalesce(1).write.parquet(f"{src}/f1")
    small_t.filter(F.col("turn_idx") >= 2).coalesce(1).write.parquet(f"{src}/f2")
    # file source reads a flat dir: move part files up
    import glob
    import shutil

    for i, part in enumerate(sorted(glob.glob(f"{src}/f*/part-*.parquet"))):
        shutil.move(part, f"{src}/batch{i}.parquet")
    shutil.rmtree(f"{src}/f1")
    shutil.rmtree(f"{src}/f2")

    streamed = kg_stream(spark, src, name="kg_stream_test")
    got = {(r.s, r.p, r.o) for r in streamed.collect()}

    batch = flagship_triples(spark, "", transcripts=small_t).unionByName(
        entity_triples(spark, "", transcripts=small_t)
    )
    want = {(r.s, r.p, r.o) for r in batch.collect()}
    assert got == want

    # the stateful operator emitted each cross-batch NEXT pair exactly once
    next_rows = [r for r in streamed.collect() if "next" in r.p]
    assert len(next_rows) == len(set(next_rows)) > 0


def test_next_state_evicted_after_watermark(spark, tmp_path):
    """Per-conversation NEXT state is dropped once the event-time
    watermark passes its last turn + 2h, while the emitted pair set
    still equals the batch answer (exactly once, nothing lost)."""
    import datetime
    import os

    from prec_spark.streaming.kg import TRANSCRIPTS_SCHEMA, next_edge_triples_stream

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)
    files = [
        # conv A, complete in batch 1
        [("A", 0, "user", "hi", None, t0), ("A", 1, "assistant", "yo", None, t0 + m)],
        # conv B starts 10h later: batch 2 moves the watermark past A's horizon...
        [("B", 0, "user", "x", None, t0 + 10 * h)],
        # ...and batch 3 (watermark now t0+8h > A's t0+1m+2h) evicts A
        [("B", 1, "assistant", "y", None, t0 + 10 * h + m)],
    ]
    src = str(tmp_path / "evict_src")
    os.makedirs(src)
    for i, rows in enumerate(files):
        df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA).coalesce(1)
        part_dir = str(tmp_path / f"part{i}")
        df.write.parquet(part_dir)
        import glob
        import shutil

        (part,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        next_edge_triples_stream(stream)
        .writeStream.format("memory")
        .queryName("evict_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = [(r.s, r.o) for r in spark.table("evict_test").collect()]
    assert sorted(got) == [
        ("_:turn_A_0", "_:turn_A_1"),
        ("_:turn_B_0", "_:turn_B_1"),
    ]  # stream == batch, each pair exactly once

    progs = [p for p in q.recentProgress if p.get("stateOperators")]
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progs]
    removed = sum(p["stateOperators"][0].get("numRowsRemoved", 0) for p in progs)
    assert max(totals) == 2  # both conversations held state at the peak
    assert totals[-1] == 1 and removed >= 1  # A evicted, only B remains


def test_stateless_triples_static_twin(spark, small_t):
    """The stateless family, evaluated on the static DF, reproduces the
    corresponding batch triples exactly (same expressions, no state)."""
    got = {(r.s, r.p, r.o) for r in stateless_triples(small_t).collect()}
    batch = flagship_triples(spark, "", transcripts=small_t).unionByName(
        entity_triples(spark, "", transcripts=small_t)
    )
    want = {
        (r.s, r.p, r.o)
        for r in batch.collect()
        if "<http://example.org/transcripts/next>" != r.p
    }
    assert got == want


def test_foreachbatch_merge_sink(spark, small_t, tmp_path):
    """Lakehouse sink (round-3 VERDICT item 7): 3 micro-batches merged
    into a parquet triple table via foreachBatch insert-if-absent; the
    table holds NO duplicate (s,p,o) rows and equals the batch answer
    without any read-side distinct."""
    from prec_spark.streaming.kg import (
        kg_stream_merge_to_parquet,
        stage_stream_source,
    )

    src = str(tmp_path / "merge_src")
    # 3 micro-batches split by EVENT TIME (a turn-idx split would feed
    # the watermark out of event order and drop cross-batch turns);
    # conversations near the cutoffs straddle batches
    stage_stream_source(spark, "", src, transcripts=small_t)

    out = str(tmp_path / "kg_table")
    ckpt = str(tmp_path / "ckpt")
    table = kg_stream_merge_to_parquet(
        spark, src, out, checkpoint_dir=ckpt,
        watermark="200 days", horizon_ms=200 * 24 * 3600 * 1000,
    )

    rows = [(r.s, r.p, r.o) for r in table.collect()]
    got = set(rows)
    assert len(rows) == len(got), "merge sink wrote duplicate triples"

    batch = flagship_triples(spark, "", transcripts=small_t).unionByName(
        entity_triples(spark, "", transcripts=small_t)
    )
    want = {(r.s, r.p, r.o) for r in batch.distinct().collect()}
    assert got == want
