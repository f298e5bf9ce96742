"""G.711 mu-law companding in a WAV container (format tag 0x0007).

The third lossy audio member of the codec family (jpeg.py = lossy
image, adpcm.py = adaptive lossy audio): ITU-T G.711 mu-law maps each
16-bit PCM sample INDEPENDENTLY to 8 bits through a piecewise-linear
approximation of a logarithmic curve — 8 segments (exponent), 16
steps each (mantissa), 2:1 compression with ~38 dB SNR.  Telephony's
codec since 1972 and still WAV format tag 0x0007.

Being stateless per sample, both directions vectorize completely in
numpy (segment index via ``np.digitize``-style comparisons — no
per-sample Python loop, unlike the inherently sequential ADPCM
recurrence), and the DuckDB oracle is a pure CLOSED-FORM per-sample
expression: no recursion, just the same integer CASE ladder.  Any
deviation in bias/clip/segment arithmetic on either side breaks the
gate hash.

Encode (sign-magnitude, the CCITT reference algorithm):

    m = min(|s|, 32635) + 132           # bias past segment 0
    e = floor(log2 m) - 7               # segment, 0..7 (m >= 132 > 2^7)
    q = (m >> (e + 3)) & 15             # mantissa
    code = ~(sign<<7 | e<<4 | q) & 255  # ones-complement on the wire

Decode (exact inverse of the quantized form):

    m' = ((q << 3) + 132) << e  - 132
    s' = -m' if sign else m'
"""

from __future__ import annotations

import struct

import numpy as np

BIAS = 132
CLIP = 32635


def mulaw_encode_np(samples: np.ndarray) -> np.ndarray:
    """int16 PCM -> uint8 mu-law codes (vectorized)."""
    s = samples.astype(np.int64)
    sign = (s < 0).astype(np.int64)
    mag = np.minimum(np.abs(s), CLIP) + BIAS
    # segment = position of the highest set bit above bit 7: count the
    # thresholds 256,512,...,16384 that mag clears (mag <= 32767 -> 0..7)
    exp = np.zeros(len(s), dtype=np.int64)
    for lo in (256, 512, 1024, 2048, 4096, 8192, 16384):
        exp += mag >= lo
    mant = (mag >> (exp + 3)) & 0x0F
    return (~((sign << 7) | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode_np(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 PCM (vectorized, exact inverse of
    the quantized representation)."""
    c = (~codes.astype(np.int64)) & 0xFF
    sign = (c >> 7) & 1
    exp = (c >> 4) & 7
    mant = c & 0x0F
    mag = (((mant << 3) + BIAS) << exp) - BIAS
    return np.where(sign == 1, -mag, mag).astype(np.int16)


def encode_wav_mulaw(sample_rate: int, samples: np.ndarray) -> bytes:
    """Mono int16 PCM -> WAV (format tag 0x0007, G.711 mu-law)."""
    payload = mulaw_encode_np(samples).tobytes()
    fmt = struct.pack(
        "<HHIIHHH",
        0x0007, 1, sample_rate, sample_rate,  # byte rate = rate (8 bit)
        1, 8,   # block align, bits per sample
        0,      # cbSize
    )
    fact = struct.pack("<I", len(samples))
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav_mulaw(data: bytes) -> tuple[int, np.ndarray]:
    """WAV (format tag 0x0007) -> (sample_rate, int16 PCM)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, n_samples, payload = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt_tag, _ch, rate = struct.unpack_from("<HHI", body, 0)
            if fmt_tag != 0x0007:
                raise ValueError(f"not mu-law (format tag {fmt_tag:#06x})")
        elif tag == b"fact":
            (n_samples,) = struct.unpack_from("<I", body, 0)
        elif tag == b"data":
            payload = body
        pos += 8 + size + (size % 2)
    if rate is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    codes = np.frombuffer(payload, dtype=np.uint8)
    if n_samples is not None:
        codes = codes[:n_samples]
    return rate, mulaw_decode_np(codes)
