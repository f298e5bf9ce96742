"""Multimodal columns: opaque binary payloads + typed metadata.

Design per the build brief: image/audio/video are `binary` columns
with a typed metadata struct; decode / feature-extract run as
Arrow-batched pandas UDFs over mapInPandas.

Round 3: image (PNG/BMP) and audio (WAV) decode is REAL — pure-stdlib
codecs in codecs.py feed the oracle-gated `media_decode` query
(media.py). This module keeps the byte-statistics feature path over
arbitrary payloads; only VIDEO decode remains stubbed below (no
container/codec support without external libraries).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

MEDIA_SCHEMA = (
    "doc_id BIGINT, payload BINARY, "
    "meta STRUCT<kind: STRING, width: INT, height: INT, codec: STRING>"
)

FEATURE_SCHEMA = "doc_id BIGINT, n_bytes INT, first_byte INT, byte_sum BIGINT"


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of the
    document text; metadata derived from doc fields."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def decode_video_stub(payload: bytes):
    """STUB — video containers/codecs need external libraries that are
    not in this environment. Image (PNG/BMP) and audio (WAV) decode is
    implemented for real in codecs.py; a video decoder would slot into
    the same mapInPandas plumbing (media.py)."""
    raise NotImplementedError(
        "video decode requires a codec library not present in this "
        "container; see codecs.py for the real PNG/BMP/WAV decoders"
    )


def binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Uses mapInPandas: each batch arrives as a pandas DataFrame with a
    bytes column; features here are deterministic byte statistics (the
    stand-in for real decode+embed)."""
    media = binary_documents(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.str.len().astype("int32"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "byte_sum": payloads.map(lambda b: sum(b)).astype("int64"),
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def binary_features_oracle_sql() -> str:
    # payload = utf-8 text; corpus is ASCII, so bytes == code units
    return """
WITH b AS (
  SELECT doc_id, encode(text) AS payload, text FROM documents
)
SELECT doc_id,
       CAST(octet_length(payload) AS INT) AS n_bytes,
       CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS INT)
         AS first_byte,
       CAST(list_sum(list_transform(string_split(text, ''),
                                    c -> ascii(c))) AS BIGINT) AS byte_sum
FROM b
"""
