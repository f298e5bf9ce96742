"""Multimodal (binary-column) operators: real PNG/BMP/WAV codecs +
byte-stats plumbing (video decode stubbed — no codec libs here)."""

from .binary import (  # noqa: F401
    binary_documents,
    binary_features,
    binary_features_oracle_sql,
    decode_video_stub,
)
from .codecs import (  # noqa: F401
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    sniff_kind,
)
from .media import (  # noqa: F401
    media_documents,
    media_features,
    media_features_oracle_sql,
)
