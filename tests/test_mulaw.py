"""G.711 mu-law codec: closed-form equivalence, container, oracle gate."""

import numpy as np

from prec_spark.multimodal.media import (
    media_mulaw_features,
    media_mulaw_oracle_sql,
    synth_mulaw_payload,
)
from prec_spark.multimodal.mulaw import (
    BIAS,
    CLIP,
    decode_wav_mulaw,
    encode_wav_mulaw,
    mulaw_decode_np,
    mulaw_encode_np,
)

from .conftest import SF_DIR
from .oracle_util import compare


def _closed_form(x: int) -> tuple[int, int]:
    """(code, decoded) per the documented CASE ladder (the oracle)."""
    mag = min(abs(x), CLIP) + BIAS
    e = sum(mag >= t for t in (256, 512, 1024, 2048, 4096, 8192, 16384))
    mant = (mag >> (e + 3)) & 15
    sign = 1 if x < 0 else 0
    code = (~((sign << 7) | (e << 4) | mant)) & 255
    m2 = (((mant << 3) + BIAS) << e) - BIAS
    return code, -m2 if sign else m2


def test_codec_matches_closed_form_exhaustive():
    """All 65536 inputs: vectorized codec == the SQL ladder."""
    s = np.arange(-32768, 32768, dtype=np.int32).astype(np.int16)
    enc = mulaw_encode_np(s)
    dec = mulaw_decode_np(enc)
    want = np.array([_closed_form(int(x)) for x in range(-32768, 32768)])
    assert np.array_equal(enc.astype(np.int64), want[:, 0])
    assert np.array_equal(dec.astype(np.int64), want[:, 1])


def test_requantization_is_idempotent():
    """decode(encode(x)) is a fixed point of the companding."""
    s = np.arange(-32768, 32768, 17, dtype=np.int32).astype(np.int16)
    dec = mulaw_decode_np(mulaw_encode_np(s))
    dec2 = mulaw_decode_np(mulaw_encode_np(dec))
    assert np.array_equal(dec, dec2)


def test_error_bound_is_half_step():
    """|err| <= half the top-segment step (+ clip slack at the rails)."""
    s = np.arange(-32635, 32636, dtype=np.int32).astype(np.int16)  # unclipped
    dec = mulaw_decode_np(mulaw_encode_np(s))
    err = np.abs(s.astype(np.int64) - dec.astype(np.int64))
    assert err.max() <= 1 << 10  # top segment quantum is 2^(7+3)=1024


def test_wav_container_round_trip():
    pcm = (np.arange(777, dtype=np.int64) * 997 % 65536 - 32768).astype(np.int16)
    rate, out = decode_wav_mulaw(encode_wav_mulaw(8000, pcm))
    assert rate == 8000
    assert np.array_equal(out, mulaw_decode_np(mulaw_encode_np(pcm)))


def test_synth_payload_is_mulaw_wav():
    payload = synth_mulaw_payload(7)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, pcm = decode_wav_mulaw(payload)
    assert rate == 8000 and len(pcm) == 96 + 7 % 64


def test_media_mulaw_oracle(spark):
    compare(media_mulaw_features(spark, SF_DIR), media_mulaw_oracle_sql(), SF_DIR)
