"""Watermarked stream-stream interval join (streaming/joins.py)."""

from pyspark.sql import functions as F

from prec_spark.streaming.joins import (
    _reply_pairs,
    reply_latency,
    reply_latency_oracle_sql,
    reply_latency_stream,
)
from prec_spark.streaming.kg import stage_stream_source

from .conftest import SF_DIR
from .oracle_util import compare


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_interval_and_key_semantics(spark):
    """Only (idx, idx+1) pairs of the same conversation within the
    symmetric 15-minute interval join; latency is signed seconds (a
    reply may carry an EARLIER timestamp — corpus clock skew)."""
    t = _turns(
        spark,
        [
            ("c1", 0, "user", "2024-01-01 10:00:00"),
            ("c1", 1, "assistant", "2024-01-01 10:00:42"),   # +42 s
            ("c1", 2, "user", "2024-01-01 09:59:30"),        # -72 s (skew)
            ("c1", 3, "assistant", "2024-01-01 11:00:00"),   # > horizon: drop
            ("c2", 1, "assistant", "2024-01-01 10:00:05"),   # other conv
        ],
    )
    got = {
        (r.conv_id, r.turn_idx): (r.role, r.reply_role, r.latency_s)
        for r in _reply_pairs(t, t).collect()
    }
    assert got == {
        ("c1", 0): ("user", "assistant", 42),
        ("c1", 1): ("assistant", "user", -72),
    }


def test_reply_latency_oracle(spark):
    compare(reply_latency(spark, SF_DIR), reply_latency_oracle_sql(), SF_DIR)


def test_stream_matches_batch(spark, tmp_path):
    """The streaming twin over 3 event-time-staged files (conversations
    straddle batches; inversions cross batch boundaries) must equal the
    batch twin exactly — inner joins emit on match, the watermark only
    evicts state, and the 2 h delay covers the corpus skew."""
    src = str(tmp_path / "rl_src")
    stage_stream_source(spark, SF_DIR, src)
    batch = {tuple(r) for r in reply_latency(spark, SF_DIR).collect()}
    stream = {
        tuple(r)
        for r in reply_latency_stream(spark, src, name="rl_test").collect()
    }
    assert batch and stream == batch
