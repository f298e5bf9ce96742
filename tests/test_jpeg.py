"""Baseline JPEG codec: bitstream round-trips, T.81 table conformance,
lossy-fidelity bounds, and the uniform-tile exactness the gate relies on."""

import numpy as np
import pytest

from prec_spark.multimodal.codecs import sniff_kind
from prec_spark.multimodal.jpeg import (
    _DCT,
    _ZZ,
    decode_jpeg,
    encode_jpeg,
)
from prec_spark.multimodal.media import (
    media_jpeg_features,
    media_jpeg_oracle_sql,
    synth_jpeg_payload,
)

from .conftest import SF_DIR
from .oracle_util import compare

# The T.81 zigzag order, transcribed from the spec (independent of the
# generator expression in jpeg.py).
_T81_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _rand_img(w, h, seed):
    return np.random.RandomState(seed).randint(0, 256, (h, w), np.uint8)


def test_zigzag_matches_t81_table():
    assert _ZZ.tolist() == _T81_ZIGZAG


def test_dct_matrix_is_orthonormal():
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


def test_uniform_tiles_roundtrip_exactly():
    # the gate contract: DC-only blocks with DQT[0]=8 are lossless,
    # across a multi-block raster (exercises the differential DC chain)
    for did in (0, 1, 7, 42, 255, 1001):
        payload = synth_jpeg_payload(did)
        assert sniff_kind(payload) == "image/jpeg"
        w, h, gray = decode_jpeg(payload)
        bw, bh = 1 + did % 4, 1 + did % 3
        assert (w, h) == (8 * bw, 8 * bh)
        ty, tx = np.mgrid[0:bh, 0:bw]
        tiles = ((17 * did + 29 * tx + 53 * ty) % 256).astype(np.uint8)
        expect = np.kron(tiles, np.ones((8, 8), np.uint8))
        assert np.array_equal(np.frombuffer(gray, np.uint8).reshape(h, w), expect)


def test_bitstream_coding_matches_numpy_reference():
    # Independent reference: quantized coefficients computed directly in
    # the test (own DCT application, spec zigzag table), reconstruction
    # through the same dequant+IDCT math. decode(encode(img)) must equal
    # it EXACTLY — any Huffman/stuffing/DC-prediction bug breaks this.
    q = np.array([8] + [16] * 63, np.float64)
    img = _rand_img(24, 16, seed=3)
    expect = np.empty_like(img)
    for by in range(2):
        for bx in range(3):
            b = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(np.float64)
            f = _DCT @ (b - 128.0) @ _DCT.T
            coef = np.round(f.reshape(64)[_T81_ZIGZAG] / q) * q
            blk = np.zeros(64)
            blk[_T81_ZIGZAG] = coef
            pix = _DCT.T @ blk.reshape(8, 8) @ _DCT + 128.0
            expect[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                np.clip(np.round(pix), 0, 255).astype(np.uint8)
            )
    w, h, gray = decode_jpeg(encode_jpeg(24, 16, img.tobytes()))
    assert (w, h) == (24, 16)
    assert np.array_equal(np.frombuffer(gray, np.uint8).reshape(16, 24), expect)


def test_lossy_fidelity_bound_fine_quant():
    # with an all-ones quant table the only loss is coefficient rounding;
    # reconstruction must stay within a few grey levels everywhere
    img = _rand_img(32, 24, seed=11)
    payload = encode_jpeg(32, 24, img.tobytes(), quant=[1] * 64)
    w, h, gray = decode_jpeg(payload)
    got = np.frombuffer(gray, np.uint8).reshape(24, 32).astype(np.int64)
    assert np.abs(got - img.astype(np.int64)).max() <= 4


def test_non_multiple_of_8_dimensions_edge_padded():
    img = _rand_img(13, 10, seed=5)
    w, h, gray = decode_jpeg(encode_jpeg(13, 10, img.tobytes(), quant=[1] * 64))
    assert (w, h) == (16, 16)  # SOF advertises the padded MCU grid
    got = np.frombuffer(gray, np.uint8).reshape(16, 16)[:10, :13].astype(np.int64)
    assert np.abs(got - img.astype(np.int64)).max() <= 4


def test_byte_stuffing_occurs_and_decodes():
    # dense random content at fine quant produces long entropy streams;
    # at least one must contain a stuffed 0xFF00 so the decoder's
    # unstuffing path is proven to run (and round-trip within bounds)
    hit = False
    for seed in range(40):
        img = _rand_img(16, 16, seed)
        payload = encode_jpeg(16, 16, img.tobytes(), quant=[1] * 64)
        sos = payload.find(b"\xff\xda")
        if b"\xff\x00" not in payload[sos + 14:-2]:
            continue
        hit = True
        _, _, gray = decode_jpeg(payload)
        got = np.frombuffer(gray, np.uint8).reshape(16, 16).astype(np.int64)
        assert np.abs(got - img.astype(np.int64)).max() <= 4
    assert hit, "no stream exercised byte stuffing"


def test_decoder_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF89a" + b"\x00" * 20)
    payload = bytearray(synth_jpeg_payload(1))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(payload))


def test_media_jpeg_gate_matches_oracle(spark):
    compare(media_jpeg_features(spark, SF_DIR), media_jpeg_oracle_sql(), SF_DIR)
