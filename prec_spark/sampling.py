"""Deterministic sampling + sequence packing for training-data prep.

Two operators every pretraining pipeline runs after curation, both
hash-gated because every step is deterministic integer/string math:

* ``stratified_sample`` — exactly K rows per stratum, chosen by a
  salted md5 rank. Uniform random sampling starves rare strata;
  ranking by a content-independent hash gives a reproducible,
  leakage-safe "random" draw (the same trick as datasets.py's split:
  nobody can nudge a row in or out without changing its key), and the
  per-stratum Window is the natural distributed shape — each stratum
  sorts independently, no global order anywhere.

* ``pack_sequences`` — greedy contiguous packing of whole documents
  into fixed-token-budget bins, the step that turns a curated corpus
  into dense training sequences. A global greedy pack is inherently
  sequential, so the scale shape is pack-per-shard: documents hash
  into SHARDS independent streams, each stream is ordered by its md5
  key and packed by a running token total (``bin = tokens_before div
  BIN_TOKENS``) — a per-shard Window, never a single global one.
  Documents are kept whole (a bin may overrun by less than one
  document, the standard no-split packing trade-off; the packer's
  efficiency is the gate output).

No reference counterpart; built per the brief's pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .session import load_table

#: rows kept per stratum
SAMPLE_K = 20
#: independent packing streams (at 100 TB: thousands)
PACK_SHARDS = 8
#: token budget per packed sequence
BIN_TOKENS = 256


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, event_id, user_id, rk): exactly SAMPLE_K events per
    event_type, ranked by the salted md5 of the event id."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    key = F.md5(F.concat(F.lit("samp#"), F.col("event_id").cast("string")))
    w = Window.partitionBy("event_type").orderBy(key, "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("event_type", "event_id", "user_id", F.col("rk").cast("int"))
    )


def stratified_sample_oracle_sql() -> str:
    return f"""
    SELECT event_type, event_id, user_id, CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT event_type, event_id, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5('samp#' || CAST(event_id AS VARCHAR)), event_id
             ) AS rk
      FROM events
    ) q
    WHERE rk <= {SAMPLE_K}
    """


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, bin, n_docs, n_tokens, overflow): the packed-bin summary
    per shard — n_tokens is the bin's whole-document token total,
    overflow how far the last document pushed it past BIN_TOKENS."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    key = F.md5(F.concat(F.lit("pack#"), F.col("doc_id").cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % PACK_SHARDS
    )
    d = d.select("doc_id", "n_tok", key.alias("k"), shard.alias("shard"))
    w = (
        Window.partitionBy("shard")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    binned = d.withColumn("bin", (before / BIN_TOKENS).cast("long"))
    return binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.greatest(
            F.lit(0).cast("long"),
            (F.sum("n_tok") - BIN_TOKENS).cast("long"),
        ).alias("overflow"),
    )


def pack_sequences_oracle_sql() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             md5('pack#' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(('0x' || substr(md5('pack#' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % {PACK_SHARDS} AS shard
      FROM documents
    ),
    b AS (
      SELECT shard,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) // {BIN_TOKENS} AS bin,
             n_tok
      FROM d
    )
    SELECT shard, CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(greatest(0, SUM(n_tok) - {BIN_TOKENS}) AS BIGINT) AS overflow
    FROM b GROUP BY shard, bin
    """
