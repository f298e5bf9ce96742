"""Multimodal columns: opaque binary payloads + typed metadata.

Design per the build brief: image/audio/video are `binary` columns
with a typed metadata struct; decode / feature-extract run as
Arrow-batched pandas UDFs over mapInPandas.

Round 3: image (PNG/BMP) and audio (WAV) decode is REAL — pure-stdlib
codecs in codecs.py feed the oracle-gated `media_decode` query
(media.py). Round 4: VIDEO decode is real too for uncompressed 24 bpp
AVI (RIFF + raw DIB frames, codecs.py encode_avi/decode_avi; gated by
the `media_video` query incl. frame sampling). This module keeps the
byte-statistics feature path over arbitrary payloads; the stub below
now marks only COMPRESSED video codecs (H.264 etc.), which genuinely
need external libraries this container doesn't have.
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
    """STUB for COMPRESSED video codecs (H.264/VP9/...), which need
    external libraries not in this environment. Uncompressed AVI is
    decoded for real (codecs.py decode_avi, gated by `media_video`);
    PNG/BMP/WAV likewise in codecs.py."""
    raise NotImplementedError(
        "compressed video codecs need a library not present in this "
        "container; uncompressed AVI decodes for real via decode_avi"
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
