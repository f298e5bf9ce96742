"""Multimodal (binary-column) plumbing with stubbed codecs."""

from .binary import (  # noqa: F401
    binary_documents,
    binary_features,
    binary_features_oracle_sql,
    decode_image_stub,
)
