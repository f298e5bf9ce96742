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
