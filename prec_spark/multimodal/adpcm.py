"""IMA/DVI ADPCM (4-bit) in a WAV container — real lossy audio codec.

Pairs with jpeg.py to close the lossy-codec family: 4:1 compression of
16-bit PCM via the IMA adaptive step-size quantizer (the scheme WAV
format tag 0x0011 and Intel/DVI audio use).

Block layout (standard WAV-IMA, mono): every ``block_align``-byte block
starts with a 4-byte header — int16 predictor (which IS the block's
first output sample), uint8 step index, reserved byte — followed by
4-bit codes, low nibble first, one sample each.

Gating strategy (media_adpcm): unlike JPEG there is no exactness
corner worth carving out — instead the DuckDB oracle REPLAYS the whole
decode recurrence (step table join + clamp arithmetic in a recursive
CTE) over the closed-form PCM corpus. Every quantizer branch, the
shift-based vpdiff reconstruction, both clamps and the index walk must
match bit-for-bit across engines for the gate hash to pass.

The per-sample loop is driver/worker Python inside Arrow batches; the
quantizer itself is branchy integer state — the honest scale path is a
JVM codegen UDF, noted in COVERAGE.md.
"""

from __future__ import annotations

import struct

import numpy as np

#: The canonical 89-entry IMA step-size table (~1.1x geometric walk).
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
assert len(STEP_TABLE) == 89

#: Index adjustment per 3-bit magnitude code (sign bit excluded).
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _quantize(diff: int, step: int) -> int:
    """4-bit code (sign | 3-bit magnitude), the IMA shift-ladder form."""
    sign = 8 if diff < 0 else 0
    d = -diff if diff < 0 else diff
    code = 0
    if d >= step:
        code |= 4
        d -= step
    if d >= step >> 1:
        code |= 2
        d -= step >> 1
    if d >= step >> 2:
        code |= 1
    return code | sign


def _step_state(code: int, step: int, predictor: int, index: int) -> tuple[int, int]:
    """Shared encoder/decoder state transition -> (predictor', index')."""
    vpdiff = step >> 3
    if code & 4:
        vpdiff += step
    if code & 2:
        vpdiff += step >> 1
    if code & 1:
        vpdiff += step >> 2
    predictor += -vpdiff if code & 8 else vpdiff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + INDEX_TABLE[code & 7]))
    return predictor, index


def encode_ima_blocks(samples: np.ndarray, block_samples: int) -> bytes:
    """Mono int16 PCM -> concatenated IMA blocks. ``block_samples`` must
    be odd (header sample + 2 per byte); the step index resets to 0 at
    each block so blocks are independently decodable (seekable)."""
    if block_samples % 2 == 0:
        raise ValueError("block_samples must be odd (header + nibble pairs)")
    out = bytearray()
    s = samples.astype(np.int64)
    for start in range(0, len(s), block_samples):
        blk = s[start:start + block_samples]
        predictor, index = int(blk[0]), 0
        out += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for v in blk[1:]:
            code = _quantize(int(v) - predictor, STEP_TABLE[index])
            predictor, index = _step_state(
                code, STEP_TABLE[index], predictor, index
            )
            nibbles.append(code)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble (decoder trims by sample count)
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)


def decode_ima_blocks(data: bytes, n_samples: int, block_samples: int) -> np.ndarray:
    """Concatenated IMA blocks -> mono int16 PCM (length n_samples)."""
    block_bytes = 4 + (block_samples - 1 + 1) // 2
    out = np.empty(n_samples, dtype=np.int16)
    pos = 0
    for start in range(0, n_samples, block_samples):
        want = min(block_samples, n_samples - start)
        predictor, index, _ = struct.unpack_from("<hBB", data, pos)
        out[start] = predictor
        body = data[pos + 4:pos + block_bytes]
        k = 1
        for b in body:
            for code in (b & 0x0F, b >> 4):
                if k >= want:
                    break
                predictor, index = _step_state(
                    code, STEP_TABLE[index], predictor, index
                )
                out[start + k] = predictor
                k += 1
        pos += block_bytes
    return out


def encode_wav_ima(sample_rate: int, samples: np.ndarray,
                   block_samples: int = 505) -> bytes:
    """Mono int16 PCM -> WAV (format tag 0x0011, IMA ADPCM)."""
    block_align = 4 + (block_samples - 1) // 2 + (block_samples - 1) % 2
    payload = encode_ima_blocks(samples, block_samples)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, sample_rate,
        sample_rate * block_align // block_samples + 1,  # nominal byte rate
        block_align, 4,  # bits per sample
        2, block_samples,  # cbSize, wSamplesPerBlock
    )
    fact = struct.pack("<I", len(samples))
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav_ima(data: bytes) -> tuple[int, np.ndarray]:
    """WAV/IMA-ADPCM -> (sample_rate, mono int16 PCM)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = block_samples = n_samples = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt_tag, ch, rate = struct.unpack_from("<HHI", body, 0)
            if fmt_tag != 0x0011 or ch != 1:
                raise ValueError("only mono IMA ADPCM (0x0011)")
            (block_samples,) = struct.unpack_from("<H", body, 18)
        elif tag == b"fact":
            (n_samples,) = struct.unpack_from("<I", body, 0)
        elif tag == b"data":
            payload = body
    if rate is None or payload is None or n_samples is None:
        raise ValueError("truncated WAV (missing fmt/fact/data)")
    return rate, decode_ima_blocks(payload, n_samples, block_samples)
