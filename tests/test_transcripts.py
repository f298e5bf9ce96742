"""Transcripts derivation: shape, determinism, and DuckDB-oracle parity."""

from pyspark.sql import functions as F

from prec_spark.transcripts import transcripts_df, transcripts_oracle_sql

from .oracle_util import compare


def test_schema(spark, sf_dir):
    t = transcripts_df(spark, sf_dir)
    dtypes = dict(t.dtypes)
    assert dtypes.pop("ts").startswith("timestamp")
    assert dtypes == {
        "conv_id": "string",
        "turn_idx": "int",
        "role": "string",
        "text": "string",
        "tool": "string",
    }


def test_turn_ordering_dense(spark, sf_dir):
    """turn_idx is 0..n-1 dense per conversation (stable ordering is the
    per-row invariant from BASELINE.json input_hint)."""
    t = transcripts_df(spark, sf_dir)
    agg = t.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
        F.countDistinct("turn_idx").alias("d"),
    )
    bad = agg.filter(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1) | (F.col("d") != F.col("n"))
    ).count()
    assert bad == 0


def test_entity_mentions_present(spark, sf_dir):
    t = transcripts_df(spark, sf_dir)
    assert t.filter(F.col("text").rlike("Ann|Dan|Biden")).count() > 0


def test_oracle_parity(spark, sf_dir):
    compare(transcripts_df(spark, sf_dir), transcripts_oracle_sql(), sf_dir)
