"""Multimodal (binary-column) operators: real PNG/BMP/WAV codecs +
byte-stats plumbing; video = real uncompressed-AVI decode (video.py;
compressed codecs stay out of scope — no codec libs here)."""

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
from .video import (  # noqa: F401
    synth_video_payload,
    video_documents,
    video_features,
    video_features_oracle_sql,
)
