"""IMA ADPCM codec: state-machine conformance, block framing, clamps,
WAV container round-trip, and the recursive-CTE oracle gate."""

import numpy as np
import pytest

from prec_spark.multimodal.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    decode_ima_blocks,
    decode_wav_ima,
    encode_ima_blocks,
    encode_wav_ima,
)
from prec_spark.multimodal.media import (
    media_adpcm_features,
    media_adpcm_oracle_sql,
    synth_adpcm_payload,
)

from .conftest import SF_DIR
from .oracle_util import compare


def _reference_decode(samples, block):
    """Independent replay of the IMA recurrence (encoder-side), written
    from the published algorithm: what the decoder MUST reproduce."""
    out = []
    for start in range(0, len(samples), block):
        blk = [int(v) for v in samples[start:start + block]]
        p, idx = blk[0], 0
        out.append(p)
        for s in blk[1:]:
            step = STEP_TABLE[idx]
            diff, code = s - p, 0
            d = abs(diff)
            if d >= step:
                code, d = code | 4, d - step
            if d >= step >> 1:
                code, d = code | 2, d - (step >> 1)
            if d >= step >> 2:
                code |= 1
            vp = (step >> 3) + (step if code & 4 else 0) \
                + (step >> 1 if code & 2 else 0) + (step >> 2 if code & 1 else 0)
            p = max(-32768, min(32767, p + (-vp if diff < 0 else vp)))
            idx = max(0, min(88, idx + INDEX_TABLE[code]))
            out.append(p)
    return np.array(out, np.int16)


def test_step_table_is_the_canonical_walk():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))


def test_decode_matches_independent_reference():
    rng = np.random.RandomState(7)
    pcm = rng.randint(-32768, 32768, 200).astype(np.int16)
    enc = encode_ima_blocks(pcm, 33)
    got = decode_ima_blocks(enc, len(pcm), 33)
    assert np.array_equal(got, _reference_decode(pcm, 33))


def test_clamps_are_reachable_and_respected():
    # a full-range square wave drives the predictor into both clamps
    # and the index to 88; a long constant tail walks the index to 0
    pcm = np.array(([32767, -32768] * 40) + [0] * 60, np.int16)
    enc = encode_ima_blocks(pcm, 141)
    got = decode_ima_blocks(enc, len(pcm), 141)
    assert np.array_equal(got, _reference_decode(pcm, 141))
    assert got.max() == 32767 and got.min() < -28000


def test_lossy_but_tracks_smooth_signals():
    i = np.arange(400)
    pcm = (3000 * np.sin(i / 20)).astype(np.int16)
    _, got = decode_wav_ima(encode_wav_ima(8000, pcm, 505))
    # 4-bit ADPCM tracks a smooth signal within a small fraction of range
    assert np.abs(got.astype(np.int64) - pcm).max() < 1200
    assert np.abs(got.astype(np.int64) - pcm).mean() < 200


def test_wav_container_roundtrip_and_validation():
    pcm = np.array([0, 100, -100, 5000, -5000] * 20, np.int16)
    data = encode_wav_ima(8000, pcm, 33)
    rate, got = decode_wav_ima(data)
    assert rate == 8000 and len(got) == len(pcm)
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav_ima(b"\x00" * 40)
    with pytest.raises(ValueError, match="block_samples must be odd"):
        encode_ima_blocks(pcm, 32)


def test_block_independence():
    # blocks reset (predictor, index): decoding block 2 alone must equal
    # its slice of the full decode
    pcm = np.random.RandomState(3).randint(-2048, 2048, 99).astype(np.int16)
    enc = encode_ima_blocks(pcm, 33)
    whole = decode_ima_blocks(enc, 99, 33)
    block_bytes = 4 + 16
    second = decode_ima_blocks(enc[block_bytes:2 * block_bytes], 33, 33)
    assert np.array_equal(second, whole[33:66])


def test_gate_corpus_spans_blocks():
    for did in (0, 31):
        rate, pcm = decode_wav_ima(synth_adpcm_payload(did))
        assert len(pcm) == 64 + did % 32 > 33  # > one block


def test_media_adpcm_gate_matches_oracle(spark):
    compare(media_adpcm_features(spark, SF_DIR), media_adpcm_oracle_sql(), SF_DIR)
